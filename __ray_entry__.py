"""Driver contract for the Ray-Data-native magic-content-extractor engine.

``entry()`` runs the flagship extraction pipeline on sf0.001.
``queries()`` exposes one callable per implemented operator family
(SURVEY.md §2 + the training-data operators); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (same column names on
both sides). Ray is initialised by the driver — nothing here calls
``ray.init``/``ray.shutdown``.
"""

from __future__ import annotations

import re as _re
from collections.abc import Callable
from typing import Any

_STOPWORD_ALT = ("a|an|and|are|as|at|be|been|by|for|from|in|is|it|of|on|or|"
                 "that|the|this|to|was|were|with")

# ONE whitespace definition across every tokenizing query and its oracle:
# the DuckDB oracles tokenize with RE2's \S+ (ASCII whitespace only), so
# the Python side must too — str.split() would also split on U+00A0,
# U+2028 etc. and silently break bit-for-bit oracle equality.
_ASCII_WORD_RE = _re.compile(r"\S+", _re.ASCII)


def _ascii_words(text: str | None) -> list[str]:
    return _ASCII_WORD_RE.findall(text or "")


def _ws_split_lists(texts):
    """Arrow list<string> of tokens split on RE2 \\s+ (ASCII whitespace,
    matching the oracles' regexp_extract_all(text, '\\S+')). Leading /
    trailing whitespace yields '' entries — callers filter those."""
    import pyarrow.compute as pc

    return pc.split_pattern_regex(texts, pattern=r"\s+")


def _bincount_i64(inv, w, minlength=0):
    """Exact int64 grouped sum: like np.bincount(inv, weights=w) but
    accumulating in int64 via np.add.at (unbuffered integer adds), so
    per-group sums are exact for any magnitude below 2^63 — no float64
    accumulator, no 2^53 low-bit loss. inv must be non-negative ints."""
    import numpy as np

    n = max(int(minlength), int(inv.max()) + 1 if len(inv) else 0)
    out = np.zeros(n, np.int64)
    np.add.at(out, inv, np.asarray(w).astype(np.int64))
    return out


def _read_pq(path: str, *, columns=None, **kwargs):
    """Column-pruned parquet read with a metadata-free schema (keeps Ray's
    block-schema dedup working; see sources/io.read_parquet_clean)."""
    from magic_content_extractor_ray.sources.io import read_parquet_clean

    return read_parquet_clean(path, columns=columns, **kwargs)


def _pool():
    from magic_content_extractor_ray.util import actor_pool

    return actor_pool()


def _batch_topk(batch, keys, *, k, group=None):
    """Per-batch Arrow-native top-k candidate pruner: sort by ``keys``
    [(col, 'descending'|'ascending'), ...] and keep the first k rows —
    or the first k per ``group`` via a vectorized within-segment rank
    mask. Replaces the pandas round-trip finishers (round-4 verdict #8);
    selection is identical, row order is group-major (downstream finals
    and the driver compare re-sort, so order never matters here)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    order = ([(group, "ascending")] if group else []) + list(keys)
    t = batch.take(pc.sort_indices(batch, sort_keys=order))
    if group is None:
        return t.slice(0, k).replace_schema_metadata(None)
    from magic_content_extractor_ray.stages.window import (
        segment_lengths, segment_starts)

    g = t.column(group).to_numpy(zero_copy_only=False)
    if not len(g):
        return t.replace_schema_metadata(None)
    starts = segment_starts(g)
    lens = segment_lengths(starts, len(g))
    rank = np.arange(len(g)) - np.repeat(starts, lens)
    return t.filter(pa.array(rank < k)).replace_schema_metadata(None)


# Per-user degree cap for the pair-expansion mining queries (covisitation,
# item_triangles). The per-user unordered-pair expansion is O(degree²); one
# bot-like user (crawler, shared account) with 10⁴–10⁵ distinct items would
# otherwise produce 10⁸–10¹⁰ pairs inside ONE partition task. Standard
# co-vis mining bound: hub users' item lists are hash-sampled down to this
# cap (deterministic in (user, item) — partition/scheduler independent), so
# per-task pair work is ≤ cap²/2 ≈ 2M pairs ≈ 16 MB. Documented bias:
# co-occurrence counts involving capped hubs are computed over a uniform
# item sample. The fixture's max degree is 24 (sf0.1), so small-SF oracle
# hashes are unaffected.
MAX_USER_ITEMS = 2000


def _cap_user_items(u, it, cap=None):
    """Deterministically cap each user's distinct-item list at ``cap``.

    ``u`` must be segment-sorted (all of a user's rows adjacent) and ``it``
    ascending within each segment — both preserved on return (sampling
    drops rows by mask, never reorders). Selection key is a splitmix64 mix
    of (user, item), so the kept sample is a pure function of the data.
    """
    import numpy as np

    from magic_content_extractor_ray.stages.window import (
        segment_lengths, segment_starts)

    if cap is None:
        cap = MAX_USER_ITEMS
    if not len(u):
        return u, it
    starts = segment_starts(u)
    lens = segment_lengths(starts, len(u))
    if int(lens.max()) <= cap:
        return u, it
    keep = np.ones(len(u), dtype=bool)
    for s, ln in zip(starts[lens > cap], lens[lens > cap]):
        s, ln = int(s), int(ln)
        salt = np.uint64((int(u[s]) * 0x9E3779B97F4A7C15) & ((1 << 64) - 1))
        mix = it[s:s + ln].astype(np.uint64) + salt
        mix ^= mix >> np.uint64(30)
        mix *= np.uint64(0xBF58476D1CE4E5B9)
        mix ^= mix >> np.uint64(27)
        mix *= np.uint64(0x94D049BB133111EB)
        mix ^= mix >> np.uint64(31)
        keep[s + np.argpartition(mix, cap)[cap:]] = False
    return u[keep], it[keep]


def _docs(sf_dir: str):
    from magic_content_extractor_ray.corpus import docs_dataset

    return docs_dataset(sf_dir)


def _extracted(sf_dir: str, **kwargs):
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    return run_extract_pipeline(_docs(sf_dir), **kwargs)


# ---------------------------------------------------------------------------
# query implementations
# ---------------------------------------------------------------------------

def q_extract_pipeline(sf_dir: str):
    """Flagship: interleaved docs → per-doc extraction summary (rows-only
    check; span-level equality is pinned by pytest goldens)."""
    out = _extracted(sf_dir)
    return out.select_columns(
        ["doc_id", "platform", "strategy_used", "title", "author",
         "publish_time", "read_count", "reply_count", "view_count",
         "text_len", "span_count", "error"]).sort("doc_id")


def q_extract_spans(sf_dir: str):
    """Exploded output spans: one row per (doc_id, offset). Fully vectorized
    (list_flatten + list_parent_indices — no Python row loop)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        return pa.table({
            "doc_id": pc.take(batch.column("doc_id"), parent),
            "offset": pc.struct_field(flat, "offset"),
            "kind": pc.struct_field(flat, "kind"),
            "media_ref": pc.struct_field(flat, "media_ref"),
            "span_text": pc.struct_field(flat, "text"),
        })

    return _extracted(sf_dir).select_columns(["doc_id", "spans"]).map_batches(
        explode, batch_format="pyarrow")


def q_extract_goldens(sf_dir: str):
    """REFERENCE-PARITY oracle row: run the real distributed extraction
    pipeline over the 14 hand-pinned golden documents
    (tests/fixtures/goldens_input.parquet — every (family, cascade-stage)
    pair from tests/goldens.json) and explode the output spans. The
    oracle reads the expected span sequence fixture, so the flagship
    north-rule invariant — span-sequence equality (kind, text, media_ref,
    order) per doc_id — is checked by the driver, not only by pytest.
    ``sf_dir`` is ignored: the golden set is scale-independent."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.pipelines.extract_pipeline import (
        run_extract_pipeline)

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "fixtures", "goldens_input.parquet")
    docs = _read_pq(fix)
    out = run_extract_pipeline(docs, batch_size=4)

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans)
        return pa.table({
            "doc_id": pc.take(batch.column("doc_id"), parent),
            "offset": pc.struct_field(flat, "offset"),
            "kind": pc.struct_field(flat, "kind"),
            "media_ref": pc.struct_field(flat, "media_ref"),
            "span_text": pc.struct_field(flat, "text"),
        })

    return out.select_columns(["doc_id", "spans"]).map_batches(
        explode, batch_format="pyarrow")


def q_extract_formats(sf_dir: str):
    """Formatter stage outputs (text & markdown) summary lengths."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = _extracted(sf_dir, formats=("text", "markdown"))

    def lens(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "platform": batch.column("platform"),
            "text_out_len": pc.cast(pc.utf8_length(batch.column("text_out")),
                                    pa.int64()),
            "markdown_len": pc.cast(pc.utf8_length(batch.column("markdown")),
                                    pa.int64()),
        })

    return out.map_batches(lens, batch_format="pyarrow")


def q_dedup_exact(sf_dir: str):
    import ray.data as rd
    from magic_content_extractor_ray.stages.dedup import exact_dedup

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return exact_dedup(docs)


def q_dedup_minhash(sf_dir: str):
    import ray.data as rd
    from magic_content_extractor_ray.stages.dedup import minhash_lsh_dedup

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return minhash_lsh_dedup(docs, threshold=0.6)


def q_dedup_simhash(sf_dir: str):
    import ray.data as rd
    from magic_content_extractor_ray.stages.dedup import simhash_dedup

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return simhash_dedup(docs, max_hamming=3)


def q_dedup_ngram(sf_dir: str):
    """EXACT word-3-gram Jaccard near-dup pairs (no sketch): inverted
    shingle index with stop-shingle (df > 32) pruning; candidates from
    surviving posting lists, triangular-decode pair emission, one int-key
    groupby for |A∩B|. The precise counterpart of dedup_minhash's
    estimated Jaccard — both sides (Ray + DuckDB oracle) share the same
    tokenization, df cap and universe."""
    from magic_content_extractor_ray.stages.dedup import ngram_jaccard_dedup

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return ngram_jaccard_dedup(docs, threshold=0.4, max_df=32)


def q_cross_dedup(sf_dir: str):
    """Cross-corpus near-dup decontamination: the held-out slice
    (doc_id % 10 == 3) plays the eval set; train docs MinHash-similar
    (est_jaccard ≥ 0.6) to any eval doc are flagged. One shared banded
    LSH pass over the tagged union; only cross-side pairs survive."""
    import numpy as np
    import pyarrow as pa

    from magic_content_extractor_ray.stages.dedup import (
        cross_corpus_near_dups)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def side(want_eval):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % 10 == 3) == want_eval))
        return f

    train = docs.map_batches(side(False), batch_format="pyarrow")
    evalset = docs.map_batches(side(True), batch_format="pyarrow")
    return cross_corpus_near_dups(train, evalset, threshold=0.6)


def q_dedup_embedding(sf_dir: str):
    """Embedding-cosine near-dup pairs over the embeddings table."""
    import ray.data as rd
    from magic_content_extractor_ray.stages.dedup import embedding_dedup

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # the synthetic embeddings top out near cosine 0.51; 0.4 keeps the
    # result non-trivial while staying in the far tail of the distribution
    return embedding_dedup(ds, threshold=0.4)


def q_pack_sequences(sf_dir: str):
    """Sequence packing for training contexts (stages/packing.py): greedy
    per-block packs of documents into a 2048-token budget."""
    import ray.data as rd
    from magic_content_extractor_ray.stages.packing import pack_documents

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    return pack_documents(docs, budget=2048).drop_columns(
        ["doc_ids"]).sort("pack_key")


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


def q_fingerprint(sf_dir: str):
    import ray.data as rd
    from magic_content_extractor_ray.stages.textops import fingerprint_batch

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(fingerprint_batch, batch_format="pyarrow").select_columns(
        ["doc_id", "fingerprint"])


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


def q_importance_sample(sf_dir: str):
    """Length-proportional importance sampling (quality-weighted data
    selection): acceptance threshold = min(1e6, n_tokens·5000) ppm —
    docs with ≥200 tokens always kept, shorter ones kept with
    probability n_tokens/200. Integer arithmetic end-to-end so the SQL
    oracle reproduces every accept/reject decision bit-for-bit."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.sample import importance_sample
    from magic_content_extractor_ray.stages.textops import token_counts

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "text"])

    def weight(batch: pa.Table) -> pa.Table:
        batch = token_counts(batch)
        w = pc.min_element_wise(
            pc.multiply(batch.column("n_tokens"), pa.scalar(5000,
                                                            pa.int64())),
            pa.scalar(1_000_000, pa.int64()))
        return batch.select(["doc_id", "n_tokens"]).append_column(
            "w_ppm", pc.cast(w, pa.int64()))

    return importance_sample(
        ds.map_batches(weight, batch_format="pyarrow"),
        weight_ppm_column="w_ppm").sort("doc_id")


def q_stratified_sample(sf_dir: str):
    """Deterministic per-language stratified sample (the data-mixing
    primitive): a pure md5-hash predicate — shuffle-free, resume-safe,
    identical at any parallelism, and bit-for-bit SQL-checkable."""
    from magic_content_extractor_ray.stages.sample import stratified_sample

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "lang"])
    return stratified_sample(
        ds, key_column="lang", pcts={"en": 50, "de": 30}, default_pct=10,
    ).sort("doc_id")


def q_source_chars_quantiles(sf_dir: str):
    """Exact per-source p50/p95 of document length via the distributed
    value-histogram quantile operator (stages/stats.grouped_quantiles) —
    per-key state is O(distinct values), never raw rows."""
    import pyarrow as pa
    from magic_content_extractor_ray.stages.stats import grouped_quantiles

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["source", "n_chars"])
    out = grouped_quantiles(ds, key_column="source",
                            value_column="n_chars",
                            quantiles=(0.5, 0.95))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "source": batch.column("source"),
            "p50_chars": batch.column("q_0_5"),
            "p95_chars": batch.column("q_0_95"),
        })

    return out.map_batches(rename, batch_format="pyarrow").sort("source")


def q_orders_rollup(sf_dir: str):
    """ROLLUP-style aggregate: order counts by (status, priority), by
    status, and the grand total in one result — three pre-aggregated
    groupbys unioned (each shuffle moves only combiner rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    ds = _read_pq(f"{sf_dir}/orders.parquet",
                  columns=["o_orderstatus", "o_orderpriority"])

    both = ds.groupby(["o_orderstatus", "o_orderpriority"]).aggregate(
        Count(alias_name="n")).map_batches(
        lambda t: pa.table({"status": t.column("o_orderstatus"),
                            "priority": t.column("o_orderpriority"),
                            "n": t.column("n")}),
        batch_format="pyarrow")
    by_status = ds.groupby("o_orderstatus").aggregate(
        Count(alias_name="n")).map_batches(
        lambda t: pa.table({"status": t.column("o_orderstatus"),
                            "priority": pa.array(["ALL"] * len(t)),
                            "n": t.column("n")}),
        batch_format="pyarrow")

    def count_partial(batch: pa.Table) -> pa.Table:
        return pa.table({"n_part": pa.array([len(batch)], pa.int64())})

    total = int(ds.map_batches(
        count_partial, batch_format="pyarrow").sum("n_part") or 0)
    import ray.data as rd

    grand = rd.from_arrow(pa.table({
        "status": pa.array(["ALL"]), "priority": pa.array(["ALL"]),
        "n": pa.array([total], pa.int64())}))
    return both.union(by_status).union(grand).sort(["status", "priority"])


def q_orders_cube(sf_dir: str):
    """GROUP BY CUBE(status, priority): the base (status, priority)
    cells come from ONE distributed combiner aggregate; the three
    margins and the grand total are derived from the tiny base-cell
    table on the driver — the standard scale shape for grouping sets
    (never re-scan the fact table per grouping set)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [("o_orderstatus", "count")])
        return pa.table({
            "status": g.column("o_orderstatus"),
            "priority": g.column("o_orderpriority"),
            "n": pc.cast(g.column("o_orderstatus_count"), pa.int64()),
        })

    cells = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderpriority"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        ["status", "priority"]).aggregate(
        Sum("n", alias_name="n")).to_pandas()

    by_status = cells.groupby("status", as_index=False)["n"].sum()
    by_status["priority"] = "ALL"
    by_prio = cells.groupby("priority", as_index=False)["n"].sum()
    by_prio["status"] = "ALL"
    total = pd.DataFrame({"status": ["ALL"], "priority": ["ALL"],
                          "n": [cells["n"].sum()]})
    out = pd.concat([cells, by_status, by_prio, total],
                    ignore_index=True)[["status", "priority", "n"]]
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["status", "priority"]).reset_index(drop=True)


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


def q_session_durations(sf_dir: str):
    """Sessionized AGGREGATE: one row per (user, session) with event
    count and duration — sessionization (30-min gap) composed with
    per-session stats, exact integer microseconds. Arrow-native window
    path (stages/window.py): one task per hash partition computes EVERY
    user's sessions at once with numpy segment kernels — no per-key
    Python callback, no pandas conversion."""
    import numpy as np
    import pyarrow as pa
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, ts_us, col_np)

    GAP_US = 1800 * 1_000_000

    def sessions(t: pa.Table) -> pa.Table:
        n = len(t)
        uid = col_np(t, "user_id")
        us = ts_us(t.column("ts"))
        ustarts = segment_starts(uid)
        new_user = np.zeros(n, dtype=bool)
        new_user[ustarts] = True
        is_start = new_user.copy()
        is_start[1:] |= (us[1:] - us[:-1]) > GAP_US
        sstarts = np.nonzero(is_start)[0]
        n_sess = len(sstarts)
        # session_id = rank of the session within its user
        sess_user = uid[sstarts]
        su_starts = segment_starts(sess_user)
        base = np.repeat(su_starts, np.diff(np.append(su_starts, n_sess)))
        sid = np.arange(n_sess, dtype=np.int64) - base + 1
        ends = np.append(sstarts[1:], n) - 1  # ts-sorted → last row = max
        return pa.table({
            "user_id": pa.array(sess_user),
            "session_id": pa.array(sid, pa.int64()),
            "n_events": pa.array(
                np.diff(np.append(sstarts, n)).astype(np.int64), pa.int64()),
            "duration_us": pa.array(us[ends] - us[sstarts], pa.int64()),
        })

    return map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "ts", "event_id"]),
        "user_id", sessions, sort_cols=["ts", "event_id"],
    ).sort(["user_id", "session_id"])


def q_user_paths(sf_dir: str):
    """Ordered per-key sequence reconstruction (string_agg … ORDER BY
    analog): each user's full event-type path in (ts, event_id) order.
    The same groupby-key → sort-within-group → concatenate shape the
    flagship pipeline uses to reassemble spans in offset order."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, col_np)

    def paths(t: pa.Table) -> pa.Table:
        uid = col_np(t, "user_id")
        starts = segment_starts(uid)
        types = t.column("event_type")
        if isinstance(types, pa.ChunkedArray):
            types = types.combine_chunks()
        # one list per user (offsets at user boundaries, zero-copy over
        # the sorted value buffer) → vectorized arrow join kernel
        offsets = pa.array(np.append(starts, len(t)).astype(np.int32))
        lists = pa.ListArray.from_arrays(offsets, types)
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "path": pc.binary_join(lists, ">"),
        })

    return map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "ts", "event_id", "event_type"]),
        "user_id", paths, sort_cols=["ts", "event_id"],
    ).sort("user_id")


def q_event_gaps(sf_dir: str):
    """LAG window (time since previous event per user), aggregated to
    per-user gap statistics in exact integer microseconds."""
    import numpy as np
    import pyarrow as pa
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, segment_lengths, ts_us, col_np)

    def gaps(t: pa.Table) -> pa.Table:
        n = len(t)
        uid = col_np(t, "user_id")
        us = ts_us(t.column("ts"))
        starts = segment_starts(uid)
        lens = segment_lengths(starts, n)
        d = np.diff(us)  # gap j = us[j+1]-us[j]
        # boundary gaps (between users) are neutralized so reduceat over
        # kept-user spans never mixes users: 0 for sums, -1 for maxes
        # (real gaps are ≥0 and every kept user has ≥1 internal gap)
        boundary = np.zeros(max(n - 1, 0), dtype=bool)
        boundary[starts[1:] - 1] = True
        d_sum = np.where(boundary, 0, d)
        d_max = np.where(boundary, -1, d)
        keep = lens >= 2  # users with <2 events emit nothing
        ks = starts[keep]
        if len(ks) == 0:
            return pa.table({
                "user_id": pa.array([], pa.int64()),
                "n_gaps": pa.array([], pa.int64()),
                "total_gap_us": pa.array([], pa.int64()),
                "max_gap_us": pa.array([], pa.int64())})
        return pa.table({
            "user_id": pa.array(uid[ks].astype(np.int64), pa.int64()),
            "n_gaps": pa.array(lens[keep] - 1, pa.int64()),
            "total_gap_us": pa.array(
                np.add.reduceat(d_sum, ks), pa.int64()),
            "max_gap_us": pa.array(
                np.maximum.reduceat(d_max, ks), pa.int64()),
        })

    return map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "ts", "event_id"]),
        "user_id", gaps, sort_cols=["ts", "event_id"],
    ).sort("user_id")


def q_running_order_total(sf_dir: str):
    """CUMULATIVE window (sum() OVER … ROWS UNBOUNDED PRECEDING): each
    customer's running order total in exact integer cents, ordered by
    (o_orderdate, o_orderkey)."""
    import numpy as np
    import pyarrow as pa
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, col_np)

    def running(t: pa.Table) -> pa.Table:
        cust = col_np(t, "o_custkey")
        cents = np.round(
            col_np(t, "o_totalprice") * 100).astype(np.int64)
        starts = segment_starts(cust)
        cum = np.cumsum(cents)
        # segmented cumsum: subtract each segment's pre-start prefix
        base = np.zeros(len(starts), dtype=np.int64)
        base[1:] = cum[starts[1:] - 1]
        lens = np.diff(np.append(starts, len(t)))
        return pa.table({
            "o_custkey": t.column("o_custkey"),
            "o_orderkey": t.column("o_orderkey"),
            "running_total_c": pa.array(
                cum - np.repeat(base, lens), pa.int64()),
        })

    return map_key_partitions(
        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_orderkey", "o_orderdate",
                          "o_totalprice"]),
        "o_custkey", running, sort_cols=["o_orderdate", "o_orderkey"],
    ).sort(["o_custkey", "o_orderkey"])


_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def q_events_pivot(sf_dir: str):
    """PIVOT via conditional aggregates: one row per user with per-type
    event counts as columns. Fully vectorized indicator columns + the
    per-batch combiner pattern (the shuffle moves one row per user per
    batch, never raw events); columns selected by NAME, never position."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "user_id": batch.column("user_id"),
            **{f"n_{et}": pc.cast(
                pc.equal(batch.column("event_type"), et), pa.int64())
               for et in _EVENT_TYPES},
        })
        g = t.group_by("user_id").aggregate(
            [(f"n_{et}", "sum") for et in _EVENT_TYPES])
        return pa.table({
            "user_id": g.column("user_id"),
            **{f"n_{et}": g.column(f"n_{et}_sum") for et in _EVENT_TYPES},
        })

    return _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        "user_id").aggregate(
        *[Sum(f"n_{et}", alias_name=f"n_{et}") for et in _EVENT_TYPES],
    ).sort("user_id")


def q_users_intersect(sf_dir: str):
    """SQL INTERSECT (distinct): users who both viewed and purchased —
    tagged-union set op, one shuffle, per-batch pre-dedup
    (stages/setops.py)."""
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.setops import set_op

    def side(event_type: str):
        return _read_pq(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type"],
            filter=(pc.field("event_type") == event_type),
        ).select_columns(["user_id"])

    return set_op(side("view"), side("purchase"),
                  key_columns="user_id", op="intersect").sort("user_id")


def q_purchase_days_clean(sf_dir: str):
    """SQL EXCEPT (distinct) on a COMPOSITE key: (user, day) pairs with a
    purchase but no error that day — multi-column tagged-union set op
    (stages/setops.py), day bucket computed vectorized at the scan edge."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.setops import set_op

    def side(event_type: str):
        def day(batch: pa.Table) -> pa.Table:
            us = pc.cast(batch.column("ts"), pa.int64())
            return pa.table({
                "user_id": batch.column("user_id"),
                "day_bucket": pc.divide(us, 86400000000),
            })

        return _read_pq(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_type"],
            filter=(pc.field("event_type") == event_type),
        ).map_batches(day, batch_format="pyarrow")

    return set_op(side("purchase"), side("error"),
                  key_columns=["user_id", "day_bucket"],
                  op="except").sort(["user_id", "day_bucket"])


def q_suppliers_by_region(sf_dir: str):
    """Multi-way STAR join: supplier ⋈ nation ⋈ region, both dims
    composed into ONE broadcast lookup (nationkey → region name) put in
    the object store once — zero shuffles regardless of fact size."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    reg = pq.read_table(f"{sf_dir}/region.parquet",
                        columns=["r_regionkey", "r_name"]).sort_by(
        "r_regionkey")
    rkeys = np.asarray(reg.column("r_regionkey").to_numpy())
    rnames = np.asarray(reg.column("r_name").to_pylist(), dtype=object)
    nat_sorted = nat.sort_by("n_nationkey")
    npos = np.clip(np.searchsorted(
        rkeys, np.asarray(nat_sorted.column("n_regionkey").to_numpy())),
        0, len(rkeys) - 1)
    lookup_ref = ray.put({
        "keys": np.asarray(nat_sorted.column("n_nationkey").to_numpy()),
        "vals": rnames[npos],
    })

    class RegionJoin:
        def __init__(self):
            lk = ray.get(lookup_ref)
            self.keys, self.vals = lk["keys"], lk["vals"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ks = batch.column("s_nationkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.keys, ks), 0,
                          len(self.keys) - 1)
            names = np.where(self.keys[pos] == ks, self.vals[pos], "UNKNOWN")
            t = pa.table({"r_name": pa.array(names.tolist(), pa.string())})
            g = t.group_by("r_name").aggregate([("r_name", "count")])
            return pa.table({
                "r_name": g.column("r_name"),
                "n_suppliers": pc.cast(g.column("r_name_count"), pa.int64()),
            })

    return _read_pq(
        f"{sf_dir}/supplier.parquet", columns=["s_nationkey"],
    ).map_batches(RegionJoin, batch_format="pyarrow",
                  concurrency=_pool()).groupby("r_name").aggregate(
        Sum("n_suppliers", alias_name="n_suppliers")).sort("r_name")


def q_orders_monthly(sf_dir: str):
    """Date-part bucketing (date_trunc('month') analog): orders and
    exact-cent revenue per (status, month), vectorized pc.year/pc.month
    + the combiner pattern."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        bucket = pc.add(pc.multiply(pc.cast(pc.year(od), pa.int64()), 12),
                        pc.subtract(pc.cast(pc.month(od), pa.int64()), 1))
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        t = pa.table({
            "o_orderstatus": batch.column("o_orderstatus"),
            "month_bucket": bucket,
            "total_c": cents,
        })
        g = t.group_by(["o_orderstatus", "month_bucket"]).aggregate(
            [("total_c", "sum"), ("total_c", "count")])
        return pa.table({
            "o_orderstatus": g.column("o_orderstatus"),
            "month_bucket": g.column("month_bucket"),
            "total_c": g.column("total_c_sum"),
            "n_orders": pc.cast(g.column("total_c_count"), pa.int64()),
        })

    return _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderstatus", "o_orderdate", "o_totalprice"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        ["o_orderstatus", "month_bucket"]).aggregate(
        Sum("total_c", alias_name="total_c"),
        Sum("n_orders", alias_name="n_orders"),
    ).sort(["o_orderstatus", "month_bucket"])


def q_event_value_totals(sf_dir: str):
    """Per-type totals of the event value column in exact integer cents
    (order-independent distributed sum; combiner pattern)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("value"), 100)), pa.int64())
        t = pa.table({"event_type": batch.column("event_type"),
                      "value_c": cents})
        g = t.group_by("event_type").aggregate(
            [("value_c", "sum"), ("value_c", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "total_value_c": g.column("value_c_sum"),
            "n_events": pc.cast(g.column("value_c_count"), pa.int64()),
        })

    return _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        "event_type").aggregate(
        Sum("total_value_c", alias_name="total_value_c"),
        Sum("n_events", alias_name="n_events")).sort("event_type")


def q_recent_orders(sf_dir: str):
    """TIMESTAMP predicate pushdown at the scan: only row groups whose
    o_orderdate stats overlap the cutoff leave storage."""
    import datetime

    import pyarrow.compute as pc

    cutoff = datetime.datetime(2001, 1, 1)
    return _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= cutoff),
    ).sort("o_orderkey")


def q_split_assignments(sf_dir: str):
    """Deterministic TRAIN/VAL/TEST split (90/5/5) by id hash — the
    dataset-splitting primitive: stable across runs and cluster shapes,
    shuffle-free (vectorized hash predicate per batch), and SQL-checked
    bit-for-bit via the same md5 bucket arithmetic."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        buckets = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 100
             for v in ids), dtype=np.int64, count=len(ids))
        split = np.where(buckets < 90, "train",
                         np.where(buckets < 95, "val", "test"))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "split": pa.array(split.tolist(), pa.string()),
        })

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
    ).map_batches(assign, batch_format="pyarrow").sort("doc_id")


def q_supplier_ship_volumes(sf_dir: str):
    """TPC-H-Q9-style star aggregate: lineitem ⋈ supplier ⋈ nation via a
    COMPOSED broadcast lookup (suppkey → nation name, put once), shipped
    quantity and tax-adjusted revenue per (nation, ship year) in exact
    integer arithmetic (price_c × disc_pct × tax_pct — fits int64
    through sf1; at larger scale switch the partial to float128/decimal
    or split the multiplier)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).sort_by(
        "s_suppkey")
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).sort_by(
        "n_nationkey")
    nkeys = np.asarray(nat.column("n_nationkey").to_numpy())
    nnames = np.asarray(nat.column("n_name").to_pylist(), dtype=object)
    spos = np.clip(np.searchsorted(
        nkeys, np.asarray(sup.column("s_nationkey").to_numpy())),
        0, len(nkeys) - 1)
    lookup_ref = ray.put({
        "keys": np.asarray(sup.column("s_suppkey").to_numpy()),
        "vals": nnames[spos],
    })

    class ShipJoin:
        def __init__(self):
            lk = ray.get(lookup_ref)
            self.keys, self.vals = lk["keys"], lk["vals"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ks = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.keys, ks), 0,
                          len(self.keys) - 1)
            names = np.where(self.keys[pos] == ks, self.vals[pos],
                             "UNKNOWN")
            year = pc.cast(pc.year(batch.column("l_shipdate")), pa.int64())
            price_c = pc.cast(pc.round(pc.multiply(
                batch.column("l_extendedprice"), 100)), pa.int64())
            disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
                pa.scalar(1.0), batch.column("l_discount")), 100)),
                pa.int64())
            tax_pct = pc.cast(pc.round(pc.multiply(pc.add(
                pa.scalar(1.0), batch.column("l_tax")), 100)), pa.int64())
            t = pa.table({
                "n_name": pa.array(names.tolist(), pa.string()),
                "ship_year": year,
                "qty": pc.cast(batch.column("l_quantity"), pa.int64()),
                "rev": pc.multiply(pc.multiply(price_c, disc_pct),
                                   tax_pct),
            })
            g = t.group_by(["n_name", "ship_year"]).aggregate(
                [("qty", "sum"), ("rev", "sum")])
            return pa.table({
                "n_name": g.column("n_name"),
                "ship_year": g.column("ship_year"),
                "sum_qty": g.column("qty_sum"),
                "revenue_c6": g.column("rev_sum"),
            })

    return _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    ).map_batches(ShipJoin, batch_format="pyarrow",
                  concurrency=_pool()).groupby(
        ["n_name", "ship_year"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("revenue_c6", alias_name="revenue_c6"),
    ).sort(["n_name", "ship_year"])


def q_brand_revenue(sf_dir: str):
    """Broadcast dim join #3 (completes table coverage: part): exact-cent
    discounted revenue per part brand — part's (partkey → brand) lookup
    is put once, lineitem streams through a vectorized searchsorted map
    + per-batch partial aggregation; no shuffle of fact rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"]).sort_by(
        "p_partkey")
    lookup_ref = ray.put({
        "keys": np.asarray(part.column("p_partkey").to_numpy()),
        "vals": np.asarray(part.column("p_brand").to_pylist(),
                           dtype=object),
    })

    class BrandJoin:
        def __init__(self):
            lk = ray.get(lookup_ref)
            self.keys, self.vals = lk["keys"], lk["vals"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ks = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.keys, ks), 0,
                          len(self.keys) - 1)
            brands = np.where(self.keys[pos] == ks, self.vals[pos],
                              "UNKNOWN")
            price_c = pc.cast(pc.round(pc.multiply(
                batch.column("l_extendedprice"), 100)), pa.int64())
            disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
                pa.scalar(1.0), batch.column("l_discount")), 100)),
                pa.int64())
            t = pa.table({
                "p_brand": pa.array(brands.tolist(), pa.string()),
                "rev": pc.multiply(price_c, disc_pct),
            })
            g = t.group_by("p_brand").aggregate(
                [("rev", "sum"), ("rev", "count")])
            return pa.table({
                "p_brand": g.column("p_brand"),
                "revenue_c4": g.column("rev_sum"),
                "n_items": pc.cast(g.column("rev_count"), pa.int64()),
            })

    return _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    ).map_batches(BrandJoin, batch_format="pyarrow",
                  concurrency=_pool()).groupby("p_brand").aggregate(
        Sum("revenue_c4", alias_name="revenue_c4"),
        Sum("n_items", alias_name="n_items")).sort("p_brand")


def q_lineitem_corr(sf_dir: str):
    """Distributed Pearson CORRELATION via mergeable integer sufficient
    statistics (n, Σx, Σy, Σx², Σy², Σxy): per-batch exact int64 partials,
    one tiny global sum, final formula on the driver. x = quantity
    (integral in this corpus), y = round(extendedprice) whole units —
    whole units keep Σy² ≈ 6.6e16 at sf1, inside int64. The SQL oracle
    computes the identical formula from the identical integers."""
    import math

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        q = pc.cast(batch.column("l_quantity"), pa.int64())
        p = pc.cast(pc.round(batch.column("l_extendedprice")), pa.int64())
        return pa.table({
            "n": pa.array([len(batch)], pa.int64()),
            "sx": pa.array([pc.sum(q).as_py() or 0], pa.int64()),
            "sy": pa.array([pc.sum(p).as_py() or 0], pa.int64()),
            "sxx": pa.array([pc.sum(pc.multiply(q, q)).as_py() or 0],
                            pa.int64()),
            "syy": pa.array([pc.sum(pc.multiply(p, p)).as_py() or 0],
                            pa.int64()),
            "sxy": pa.array([pc.sum(pc.multiply(q, p)).as_py() or 0],
                            pa.int64()),
        })

    stats = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in
          ("n", "sx", "sy", "sxx", "syy", "sxy")])

    n, sx, sy = stats["n"], stats["sx"], stats["sy"]
    sxx, syy, sxy = stats["sxx"], stats["syy"], stats["sxy"]
    # mirror the oracle's double-arithmetic shape exactly:
    # (n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy))
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt((float(n) * float(sxx) - float(sx) * float(sx)) *
                    (float(n) * float(syy) - float(sy) * float(sy)))
    return pd.DataFrame({"n": [int(n)],
                         "corr_qp": [round(num / den, 6)]})


def q_label_centroids(sf_dir: str):
    """Per-label embedding CENTROID sufficient statistics in exact integer
    micro-units: vectorized list flatten + positional index (no Python
    row loop), per-batch (label, dim) partial sums, one bounded shuffle
    (labels × dims rows). Values are scaled ×1e6 and rounded half-away
    (DuckDB round semantics) so the distributed sum is order-independent
    and hash-matches SQL."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(
            zero_copy_only=False).astype(np.float64)
        lengths = pc.list_value_length(emb).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.cumsum(lengths) - lengths
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            starts, lengths) + 1
        labels = np.repeat(batch.column("label").to_numpy(
            zero_copy_only=False).astype(np.int64), lengths)
        v = flat * 1e6
        micro = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        t = pa.table({
            "label": pa.array(labels, pa.int64()),
            "dim": pa.array(pos, pa.int64()),
            "sum_micro": pa.array(micro, pa.int64()),
        })
        g = t.group_by(["label", "dim"]).aggregate(
            [("sum_micro", "sum"), ("sum_micro", "count")])
        return pa.table({
            "label": g.column("label"),
            "dim": g.column("dim"),
            "sum_micro": g.column("sum_micro_sum"),
            "n_vals": pc.cast(g.column("sum_micro_count"), pa.int64()),
        })

    return _read_pq(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        ["label", "dim"]).aggregate(
        Sum("sum_micro", alias_name="sum_micro"),
        Sum("n_vals", alias_name="n_vals")).sort(["label", "dim"])


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


def q_active_days(sf_dir: str):
    """SQL UNION (distinct) through the tagged-union set op: all (user,
    day) pairs with click OR purchase activity (stages/setops.py)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.setops import set_op

    def side(event_type: str):
        def day(batch: pa.Table) -> pa.Table:
            us = pc.cast(batch.column("ts"), pa.int64())
            return pa.table({
                "user_id": batch.column("user_id"),
                "day_bucket": pc.divide(us, 86400000000),
            })

        return _read_pq(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_type"],
            filter=(pc.field("event_type") == event_type),
        ).map_batches(day, batch_format="pyarrow")

    return set_op(side("click"), side("purchase"),
                  key_columns=["user_id", "day_bucket"],
                  op="union").sort(["user_id", "day_bucket"])


def q_chars_quartiles(sf_dir: str):
    """NTILE-style quantile bucketing: exact global quartile cutpoints
    from the distributed value-histogram quantile operator (tiny result —
    n_chars cardinality, not rows), broadcast into a vectorized bucketing
    pass + combiner aggregate. Two passes over one column, no row-level
    shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum
    from magic_content_extractor_ray.stages.stats import grouped_quantiles

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    cuts_tbl = grouped_quantiles(
        docs.map_batches(
            lambda t: t.append_column(
                "g", pa.array([1] * len(t), pa.int64())),
            batch_format="pyarrow"),
        key_column="g", value_column="n_chars",
        quantiles=(0.25, 0.5, 0.75)).to_pandas()
    p25 = float(cuts_tbl["q_0_25"].iloc[0])
    p50 = float(cuts_tbl["q_0_5"].iloc[0])
    p75 = float(cuts_tbl["q_0_75"].iloc[0])

    def bucket(batch: pa.Table) -> pa.Table:
        n = batch.column("n_chars")
        q = pc.if_else(
            pc.less_equal(n, p25), pa.scalar(1, pa.int64()),
            pc.if_else(pc.less_equal(n, p50), pa.scalar(2, pa.int64()),
                       pc.if_else(pc.less_equal(n, p75),
                                  pa.scalar(3, pa.int64()),
                                  pa.scalar(4, pa.int64()))))
        t = pa.table({"quartile": q, "n_chars": n})
        g = t.group_by("quartile").aggregate(
            [("n_chars", "sum"), ("n_chars", "count")])
        return pa.table({
            "quartile": g.column("quartile"),
            "total_chars": g.column("n_chars_sum"),
            "n_docs": pc.cast(g.column("n_chars_count"), pa.int64()),
        })

    return docs.map_batches(bucket, batch_format="pyarrow").groupby(
        "quartile").aggregate(
        Sum("total_chars", alias_name="total_chars"),
        Sum("n_docs", alias_name="n_docs")).sort("quartile")


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape: the dimension-sized customer side is a BROADCAST
    semi-filter (`ray.put` once, sorted-array membership per batch — no
    shuffle for join #1), then ONE partitioned hash_join brings
    post-cutoff lineitems to their surviving orders. Exact-cent integer
    revenue (no float-sum drift), per-batch partial aggregation before
    the single-int-key groupby, top-10 with a full deterministic
    tiebreak. All filters and the revenue computation run map-side."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Min, Sum

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import ts_us

    cut_us = int(np.datetime64("1996-06-30T00:00:00").astype(
        "datetime64[us]").astype(np.int64))

    cust_tbl = pq.read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
    keep_keys = np.sort(cust_tbl.filter(pc.equal(
        cust_tbl.column("c_mktsegment"), "BUILDING")).column(
        "c_custkey").to_numpy(zero_copy_only=False).astype(np.int64))
    keys_ref = ray.put(keep_keys)

    def ords_side(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        days = ts_us(t.column("o_orderdate")) // 86_400_000_000
        ck = t.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(ks, ck), 0, max(len(ks) - 1, 0))
        keep = (ts_us(t.column("o_orderdate")) < cut_us) \
            & (len(ks) > 0) & (ks[pos] == ck)
        return pa.table({"l_orderkey": t.column("o_orderkey"),
                         "o_days": pa.array(days, pa.int64())}
                        ).filter(pa.array(keep))

    j1 = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        ords_side, batch_format="pyarrow")

    def line_side(t: pa.Table) -> pa.Table:
        keep = ts_us(t.column("l_shipdate")) > cut_us
        t = t.filter(pa.array(keep))
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
            pa.scalar(1.0), t.column("l_discount")), 100)), pa.int64())
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev": pc.multiply(price_c, disc_pct)})

    li = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"]).map_batches(line_side,
                                            batch_format="pyarrow")

    j2 = hash_join(
        li, j1, key="l_orderkey", left_cols=["rev"],
        right_cols=["o_days"],
        left_types={"l_orderkey": pa.int64(), "rev": pa.int64()},
        right_types={"o_days": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate(
            [("rev", "sum"), ("o_days", "min")])
        return pa.table({"l_orderkey": g.column("l_orderkey"),
                         "rev": g.column("rev_sum"),
                         "o_days": g.column("o_days_min")})

    agg = j2.map_batches(partial, batch_format="pyarrow").groupby(
        "l_orderkey").aggregate(Sum("rev", alias_name="revenue_c4"),
                                Min("o_days", alias_name="o_days"))

    top = agg.sort(["revenue_c4", "o_days", "l_orderkey"],
                   descending=[True, False, False]).limit(10)

    def finish(t: pa.Table) -> pa.Table:
        days = t.column("o_days").to_numpy(zero_copy_only=False)
        dates = (np.datetime64("1970-01-01")
                 + days.astype("timedelta64[D]")).astype(
                     "datetime64[D]").astype(str)
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "revenue_c4": t.column("revenue_c4"),
                         "o_orderdate": pa.array(dates, pa.string())})

    return top.map_batches(finish, batch_format="pyarrow")


def q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention matrix (cohort = ISO week of a user's
    first event; one row per (cohort_week, week_offset) with distinct
    active users). Every shuffle key is a PACKED int64: distinct
    (user, week) via one packed groupby, per-user cohort minima via a
    hash-partition segment kernel, final (cohort, offset) counts via a
    second packed groupby — no string or composite keys move."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    ev = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def pack_user_week(batch: pa.Table) -> pa.Table:
        day = ts_us(batch.column("ts")) // 86_400_000_000
        wk = day - ((day + 3) % 7)           # Monday day-number (ISO)
        wkidx = wk // 7                      # fits 16 bits through 3100 AD
        uid = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pk = (uid << np.int64(16)) | wkidx
        return pa.table({"pk": pa.array(np.unique(pk), pa.int64())})

    uw = ev.map_batches(pack_user_week, batch_format="pyarrow").groupby(
        "pk").aggregate(Count(alias_name="_n")).drop_columns(["_n"])

    def cohort_offsets(t: pa.Table) -> pa.Table:
        pk = t.column("pk").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        uid = pk >> np.int64(16)
        wkidx = pk & np.int64((1 << 16) - 1)
        starts = segment_starts(uid)
        lens = segment_lengths(starts, len(uid))
        cohort = np.repeat(np.minimum.reduceat(wkidx, starts), lens)
        ck = (cohort << np.int64(16)) | (wkidx - cohort)
        return pa.table({"ck": pa.array(ck, pa.int64()),
                         "n": pa.array(np.ones(len(ck), np.int64),
                                       pa.int64())})

    counts = map_key_partitions(
        uw.map_batches(
            lambda t: t.append_column(
                "u", pa.array(t.column("pk").to_numpy(
                    zero_copy_only=False) >> np.int64(16), pa.int64())),
            batch_format="pyarrow"),
        "u", cohort_offsets,
    ).groupby("ck").aggregate(Sum("n", alias_name="n_users"))

    def unpack(t: pa.Table) -> pa.Table:
        ck = t.column("ck").to_numpy(zero_copy_only=False).astype(np.int64)
        wk = (ck >> np.int64(16)) * 7 + 4    # Monday day-numbers ≡ 4 mod 7
        dates = (np.datetime64("1970-01-01")
                 + wk.astype("timedelta64[D]")).astype(
                     "datetime64[D]").astype(str)
        return pa.table({
            "cohort_week": pa.array(dates, pa.string()),
            "week_offset": pa.array(ck & np.int64((1 << 16) - 1),
                                    pa.int64()),
            "n_users": t.column("n_users")})

    return counts.map_batches(unpack, batch_format="pyarrow").sort(
        ["cohort_week", "week_offset"])


def q_funnel_counts(sf_dir: str):
    """Ordered conversion funnel (view → click → purchase by strictly
    increasing FIRST-occurrence time per user): per-batch Arrow partials
    reduce each user's stage timestamps map-side (sentinel-int64, no
    null-semantics dependence), ONE (user → 3 int64) shuffle, then a
    driver-side 3-counter aggregate — the events payload never moves."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Min, Sum

    from magic_content_extractor_ray.stages.window import ts_us

    INF = np.int64(1 << 62)
    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type"])

    def partial(batch: pa.Table) -> pa.Table:
        ts = pa.array(ts_us(batch.column("ts")), pa.int64())
        et = batch.column("event_type")
        cols = {"user_id": batch.column("user_id")}
        for name, stage in (("tv", "view"), ("tc", "click"),
                            ("tp", "purchase")):
            cols[name] = pc.if_else(pc.equal(et, stage), ts,
                                    pa.scalar(INF, pa.int64()))
        g = pa.table(cols).group_by("user_id").aggregate(
            [("tv", "min"), ("tc", "min"), ("tp", "min")])
        return pa.table({"user_id": g.column("user_id"),
                         "tv": g.column("tv_min"),
                         "tc": g.column("tc_min"),
                         "tp": g.column("tp_min")})

    firsts = ev.map_batches(partial, batch_format="pyarrow").groupby(
        "user_id").aggregate(Min("tv", alias_name="tv"),
                             Min("tc", alias_name="tc"),
                             Min("tp", alias_name="tp"))

    def flags(batch: pa.Table) -> pa.Table:
        tv = batch.column("tv").to_numpy(zero_copy_only=False)
        tc = batch.column("tc").to_numpy(zero_copy_only=False)
        tp = batch.column("tp").to_numpy(zero_copy_only=False)
        v = tv < INF
        vc = v & (tc < INF) & (tc > tv)
        full = vc & (tp < INF) & (tp > tc)
        return pa.table({
            "n_view": pa.array(v.astype(np.int64), pa.int64()),
            "n_view_click": pa.array(vc.astype(np.int64), pa.int64()),
            "n_funnel_complete": pa.array(full.astype(np.int64),
                                          pa.int64())})

    row = firsts.map_batches(flags, batch_format="pyarrow").aggregate(
        Sum("n_view", alias_name="n_view"),
        Sum("n_view_click", alias_name="n_view_click"),
        Sum("n_funnel_complete", alias_name="n_funnel_complete"))
    return pd.DataFrame([row])


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


def q_epoch_shuffle(sf_dir: str):
    """Deterministic EPOCH SHUFFLE (training-data global reordering):
    every document's position in the md5(epoch_salt + id) order —
    a reproducible, resumable stand-in for random_shuffle (same rank
    for the same id/epoch on any cluster shape), computed as a
    distributed prefix-count over the 60-bit hash key instead of a full
    sort. Changing the salt re-shuffles for the next epoch."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum

    SALT = "epoch-0:"

    def hash_key(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hs = [int(hashlib.md5((SALT + str(i)).encode()).hexdigest()[:15],
                  16) for i in ids]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "h": pa.array(hs, pa.int64()),
            "one": pa.array([1] * len(batch), pa.int64()),
        })

    ranked = keyed_prefix_sum(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["doc_id"]).map_batches(
            hash_key, batch_format="pyarrow"),
        key_column="h", value_column="one", bucket_width=1 << 44,
        out_column="rk", tie_column="doc_id")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "shuffle_pos": pc.add(batch.column("rk"),
                                  pa.scalar(1, pa.int64())),
        })

    return ranked.map_batches(finish, batch_format="pyarrow").sort(
        "shuffle_pos")


def q_doc_char_rank(sf_dir: str):
    """Global ROW_NUMBER over a total order (n_chars, doc_id) — the
    second consumer of the distributed ordered prefix-sum: rank =
    exclusive count of preceding rows + 1, computed without any global
    sort of the full table (per-bucket counts + bounded driver prefix)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"]).map_batches(
        lambda t: t.append_column(
            "one", pa.array([1] * len(t), pa.int64())),
        batch_format="pyarrow")
    out = keyed_prefix_sum(docs, key_column="n_chars",
                           value_column="one", bucket_width=100,
                           out_column="rn0", tie_column="doc_id")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": batch.column("n_chars"),
            "rn": pc.add(batch.column("rn0"), pa.scalar(1, pa.int64())),
        })

    return out.map_batches(finish, batch_format="pyarrow").sort("rn")


def q_embedding_norms(sf_dir: str):
    """Vector ops over the embedding column: per-vector squared L2 norm
    in exact integer micro²-units (values scaled ×1e6, half-away
    rounded — same convention as label_centroids, so the reduction is
    order-independent and SQL-matchable). Fully vectorized: list
    flatten + segment sums via parent run-lengths; no Python row loop."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def norms(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(
            zero_copy_only=False).astype(np.float64)
        lengths = pc.list_value_length(emb).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = flat * 1e6
        micro = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        sq = micro * micro
        ends = np.cumsum(lengths)
        sums = np.add.reduceat(sq, np.concatenate([[0], ends[:-1]])) \
            if len(sq) else np.zeros(0, np.int64)
        sums = np.where(lengths == 0, 0, sums)
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "norm_sq_micro": pa.array(sums, pa.int64()),
        })

    return _read_pq(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
    ).map_batches(norms, batch_format="pyarrow").sort("vec_id")


def q_lang_chars_var(sf_dir: str):
    """Per-group VARIANCE (sample) from mergeable exact-integer
    sufficient statistics (n, Σx, Σx²): one combiner aggregate, final
    formula vectorized over the tiny per-group table — the same shape
    DuckDB's var_samp streams, but shuffle-free until the bounded
    group table."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column("n_chars")
        t = pa.table({
            "lang": batch.column("lang"),
            "sx": x,
            "sxx": pc.multiply(x, x),
        })
        g = t.group_by("lang").aggregate(
            [("sx", "sum"), ("sxx", "sum"), ("sx", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "sx": g.column("sx_sum"),
            "sxx": g.column("sxx_sum"),
            "n": pc.cast(g.column("sx_count"), pa.int64()),
        })

    stats = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        "lang").aggregate(
        Sum("sx", alias_name="sx"), Sum("sxx", alias_name="sxx"),
        Sum("n", alias_name="n")).to_pandas()

    n = stats["n"].to_numpy().astype(np.float64)
    sx = stats["sx"].to_numpy().astype(np.float64)
    sxx = stats["sxx"].to_numpy().astype(np.float64)
    # mirror the oracle's double shape: (sxx - sx*sx/n) / (n-1)
    var = np.round((sxx - sx * sx / n) / (n - 1), 6)
    return pd.DataFrame({"lang": stats["lang"], "n": stats["n"],
                         "var_chars": var}).sort_values(
        "lang").reset_index(drop=True)


def q_customers_with_purchases(sf_dir: str):
    """SEMI join with Bloom pushdown: the purchase-user Bloom filter is
    built distributed (one filter per batch, OR-merged), broadcast via
    ray.put, and drops non-member customers INSIDE map_batches before
    the exact semi join — the shuffle sees only Bloom survivors
    (false-positive rate, not the full table). Exactness comes from the
    hash-join against the true distinct-user set."""
    import numpy as np
    import pyarrow as pa
    import ray
    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.sketch import (
        BloomFilter, build_bloom)
    import pyarrow.compute as pc

    purchasers = _read_pq(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"],
        filter=(pc.field("event_type") == "purchase"),
    ).select_columns(["user_id"]).map_batches(
        lambda t: t.group_by("user_id").aggregate([]),
        batch_format="pyarrow")

    bloom = build_bloom(purchasers, "user_id", n_bits=1 << 16)
    bloom_ref = ray.put(bloom.to_bytes())
    n_bits, k = bloom.n_bits, bloom.k

    class BloomPrefilter:
        def __init__(self):
            self.bloom = BloomFilter.from_bytes(
                ray.get(bloom_ref), n_bits, k)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("c_custkey").to_numpy(
                zero_copy_only=False)
            return batch.filter(pa.array(self.bloom.contains_many(keys)))

    survivors = _read_pq(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
    ).map_batches(BloomPrefilter, batch_format="pyarrow",
                  concurrency=_pool())

    # global distinct via window.hash_agg (batch-level distinct above is
    # the combiner; Ray's sort aggregate would pay a Python callback per
    # purchaser — an entity-cardinality key)
    from magic_content_extractor_ray.stages.window import hash_agg

    distinct_p = hash_agg(
        purchasers, "user_id",
        [("user_id", "count_all", "_n")]).map_batches(
        lambda t: pa.table({
            "c_custkey": t.column("user_id"),
            "one": pa.array(np.ones(len(t), np.int64)),
        }), batch_format="pyarrow")

    _i64 = pa.int64()
    joined = hash_join(
        survivors.map_batches(
            lambda t: t.append_column(
                "z", pa.array(np.zeros(len(t), np.int64))),
            batch_format="pyarrow"),
        distinct_p, key="c_custkey", left_cols=["z"],
        right_cols=["one"], how="inner",
        left_types={"c_custkey": _i64, "z": _i64},
        right_types={"c_custkey": _i64, "one": _i64})
    return joined.select_columns(["c_custkey"]).sort("c_custkey")


def q_daily_view_purchase(sf_dir: str):
    """FULL OUTER partitioned hash join: per-(user, day) view counts vs
    purchase counts — unmatched rows survive from BOTH sides (days with
    views but no purchases and vice versa). Composite key packed into
    one int64 (user_id·10^6 + day) so the join shuffles a single key
    column; both sides are pre-aggregated before the exchange."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum
    from magic_content_extractor_ray.stages.join import hash_join

    DAY_US = 86400000000

    def side(event_type: str, out_col: str):
        def partial(batch: pa.Table) -> pa.Table:
            us = pc.cast(batch.column("ts"), pa.int64())
            ukey = pc.add(
                pc.multiply(batch.column("user_id"),
                            pa.scalar(1_000_000, pa.int64())),
                pc.divide(us, DAY_US))
            t = pa.table({"ukey": ukey})
            g = t.group_by("ukey").aggregate([("ukey", "count")])
            return pa.table({
                "ukey": g.column("ukey"),
                out_col: pc.cast(g.column("ukey_count"), pa.int64()),
            })

        return _read_pq(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_type"],
            filter=(pc.field("event_type") == event_type),
        ).map_batches(partial, batch_format="pyarrow").groupby(
            "ukey").aggregate(Sum(out_col, alias_name=out_col))

    _i64 = pa.int64()
    joined = hash_join(side("view", "n_views"),
                       side("purchase", "n_purchases"),
                       key="ukey", left_cols=["n_views"],
                       right_cols=["n_purchases"], how="full",
                       left_types={"ukey": _i64, "n_views": _i64},
                       right_types={"ukey": _i64, "n_purchases": _i64})

    def finish(batch: pa.Table) -> pa.Table:
        ukey = batch.column("ukey")
        zero = pa.scalar(0, pa.int64())
        return pa.table({
            "user_id": pc.divide(ukey, 1_000_000),
            "day_bucket": pc.subtract(
                ukey, pc.multiply(pc.divide(ukey, 1_000_000),
                                  pa.scalar(1_000_000, pa.int64()))),
            "n_views": pc.coalesce(batch.column("n_views"), zero),
            "n_purchases": pc.coalesce(batch.column("n_purchases"), zero),
        })

    return joined.map_batches(finish, batch_format="pyarrow").sort(
        ["user_id", "day_bucket"])


def q_sample_fixed(sf_dir: str):
    """Deterministic fixed-SIZE uniform sample (reservoir-sampling
    analog): the 50 docs with the smallest md5(doc_id) — tree of
    per-batch bottom-k's, stable across runs/parallelism
    (stages/sample.fixed_k_sample)."""
    from magic_content_extractor_ray.stages.sample import fixed_k_sample

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang"])
    return fixed_k_sample(docs, k=50, id_column="doc_id")


def q_sample_per_lang(sf_dir: str):
    """Deterministic k-per-group sample: exactly 10 docs per language by
    hash order (stages/sample.fixed_k_per_group, tree-reduced)."""
    from magic_content_extractor_ray.stages.sample import fixed_k_per_group

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang"])
    return fixed_k_per_group(docs, k=10, group_column="lang",
                             id_column="doc_id").sort(["lang", "doc_id"])


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


def q_chunk_dedup(sf_dir: str):
    """CHUNK-level exact dedup (paragraph-granularity dedup, the
    FineWeb-style refinement of doc-level dedup): the chunking stage
    feeds the md5-groupby dedup operator directly — chunks shared
    across documents collapse to one representative."""
    from magic_content_extractor_ray.stages.dedup import exact_dedup

    chunks = q_doc_chunks(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "chunk_id", "chunk_text"]),
        batch_format="pyarrow")

    # id = doc_id * 1e6 + chunk_id so min-id keeps the earliest doc's copy
    import pyarrow as pa
    import pyarrow.compute as pc

    def pack_id(batch: pa.Table) -> pa.Table:
        cid = pc.add(pc.multiply(batch.column("doc_id"),
                                 pa.scalar(1_000_000, pa.int64())),
                     batch.column("chunk_id"))
        return pa.table({"chunk_key": cid,
                         "chunk_text": batch.column("chunk_text")})

    return exact_dedup(
        chunks.map_batches(pack_id, batch_format="pyarrow"),
        column="chunk_text", id_column="chunk_key").sort("chunk_key")


def q_docs_decontaminated(sf_dir: str):
    """DECONTAMINATION: drop every document containing any benchmark
    phrase (the standard eval-leak filter). The phrase blocklist (here:
    an 8-token phrase from each of the first 5 docs, derived
    deterministically from the corpus itself) is broadcast once;
    membership is a vectorized substring scan per phrase — map-side
    only, no shuffle, scales to any corpus size with a bounded
    blocklist."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    seed = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).sort_by("doc_id")
    phrases = []
    for i in range(5):
        toks = _ascii_words(seed.column("text")[i].as_py())
        phrases.append(" ".join(toks[10:18]))
    phrases = [p for p in phrases if p]

    def keep_clean(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        hit = None
        for p in phrases:
            m = pc.match_substring(text, p)
            hit = m if hit is None else pc.or_(hit, m)
        return batch.filter(pc.invert(hit)).select(["doc_id"])

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"],
    ).map_batches(keep_clean, batch_format="pyarrow").sort("doc_id")


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


def q_customer_order_counts(sf_dir: str):
    """LEFT OUTER partitioned hash join: every customer with their order
    count, zero-order customers included (pre-aggregated right side, so
    the join's shuffle moves one row per customer per side)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count
    from magic_content_extractor_ray.stages.join import hash_join

    from magic_content_extractor_ray.stages.window import hash_agg

    def _cnt_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([([], "count_all")])
        return pa.table({"o_custkey": g.column("o_custkey"),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    # hash_agg over the customer-cardinality key (sort-aggregate pays a
    # Python callback per customer at scale), 64k map-side partials
    counts = hash_agg(
        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey"]).map_batches(
            _cnt_partial, batch_format="pyarrow", batch_size=65536),
        "o_custkey", [("cnt", "sum", "cnt")]).map_batches(
        lambda t: pa.table({"c_custkey": t.column("o_custkey"),
                            "cnt": t.column("cnt")}),
        batch_format="pyarrow")
    cust = _read_pq(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    _i64 = pa.int64()
    joined = hash_join(cust.map_batches(
        lambda t: t.append_column("one", pa.array([1] * len(t), pa.int64())),
        batch_format="pyarrow"), counts, key="c_custkey",
        left_cols=["one"], right_cols=["cnt"], how="left",
        left_types={"c_custkey": _i64, "one": _i64},
        right_types={"c_custkey": _i64, "cnt": _i64})

    def finish(batch: pa.Table) -> pa.Table:
        n = pc.coalesce(batch.column("cnt"), pa.scalar(0, pa.int64()))
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "n_orders": pc.cast(n, pa.int64())})

    return joined.map_batches(finish, batch_format="pyarrow").sort(
        "c_custkey")


def q_last_event_per_user(sf_dir: str):
    """Per-key top-1 window (row_number() = 1 analog): each user's most
    recent event, ties broken by event_id."""
    import numpy as np
    import pyarrow as pa
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, col_np)

    def last_per_user(t: pa.Table) -> pa.Table:
        uid = col_np(t, "user_id")
        starts = segment_starts(uid)
        # ascending (ts, event_id) within user → last row of each
        # segment IS the (ts, event_id)-max row
        ends = np.append(starts[1:], len(t)) - 1
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "last_event": pa.array(
                col_np(t, "event_id")[ends].astype(np.int64), pa.int64()),
        })

    return map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "ts", "event_id"]),
        "user_id", last_per_user, sort_cols=["ts", "event_id"],
    ).sort("user_id")


def q_supplier_nation(sf_dir: str):
    """Broadcast dim join #2: suppliers per nation name (nation is put
    once; lookup inside map_batches — no shuffle)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    import numpy as np

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).sort_by(
        "n_nationkey")
    lookup_ref = ray.put({
        "keys": np.asarray(nat.column("n_nationkey").to_numpy()),
        "vals": np.asarray(nat.column("n_name").to_pylist(), dtype=object),
    })

    class NationJoin:
        def __init__(self):
            lk = ray.get(lookup_ref)
            self.keys, self.vals = lk["keys"], lk["vals"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            ks = batch.column("s_nationkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.keys, ks), 0,
                          len(self.keys) - 1)
            names = np.where(self.keys[pos] == ks, self.vals[pos], "UNKNOWN")
            t = pa.table({"n_name": pa.array(names.tolist(), pa.string())})
            g = t.group_by("n_name").aggregate([("n_name", "count")])
            return pa.table({
                "n_name": g.column("n_name"),
                "n_suppliers": pc.cast(g.column("n_name_count"), pa.int64()),
            })

    ds = _read_pq(f"{sf_dir}/supplier.parquet", columns=["s_nationkey"])
    return ds.map_batches(NationJoin, batch_format="pyarrow",
                          concurrency=_pool()).groupby("n_name").aggregate(
        Sum("n_suppliers", alias_name="n_suppliers")).sort("n_name")


def q_lineitem_revenue(sf_dir: str):
    """Discounted revenue per return flag in EXACT integer arithmetic
    (cents × discount-percent, both integral) so the distributed sum is
    order-independent and hash-matches DuckDB."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
            pa.scalar(1.0), batch.column("l_discount")), 100)), pa.int64())
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "rev": pc.multiply(price_c, disc_pct),
        })
        g = t.group_by("l_returnflag").aggregate(
            [("rev", "sum"), ("rev", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "revenue_c4": g.column("rev_sum"),
            "n_rows": pc.cast(g.column("rev_count"), pa.int64()),
        })

    ds = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_returnflag", "l_extendedprice", "l_discount"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "l_returnflag").aggregate(
        Sum("revenue_c4", alias_name="revenue_c4"),
        Sum("n_rows", alias_name="n_rows")).sort("l_returnflag")


def q_sliding_events(sf_dir: str):
    """SLIDING-window aggregate (3-hour window, 1-hour slide): per
    (event_type, hour), the event count summed over the current and two
    preceding hours. The sliding pass runs on the ALREADY-AGGREGATED
    hourly table (bounded: types × hours), so the per-key map_groups holds
    kilobytes even at 100 TB of raw events."""
    import pandas as pd

    hourly = q_events_hourly(sf_dir)

    def slide(g: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        g = g.sort_values("hour_bucket").reset_index(drop=True)
        # sum over hour buckets in [h-2, h] — buckets may be sparse, so a
        # positional rolling(3) would be wrong; vectorized value-window
        # via searchsorted over the cumulative counts (O(H log H))
        hours = g["hour_bucket"].to_numpy()
        cs = np.concatenate([[0], g["n_events"].to_numpy().cumsum()])
        lo = np.searchsorted(hours, hours - 2, side="left")
        hi = np.searchsorted(hours, hours, side="right")
        out = cs[hi] - cs[lo]
        return pd.DataFrame({"event_type": g["event_type"],
                             "hour_bucket": g["hour_bucket"],
                             "sliding_events": out.astype("int64")})

    return hourly.groupby("event_type").map_groups(
        slide, batch_format="pandas")


def q_lang_median_chars(sf_dir: str):
    """Exact per-group MEDIAN via the distributed value-histogram quantile
    operator (stages/stats.grouped_quantiles, q=0.5 — quantile_cont
    interpolation == SQL median). No group ever holds raw rows."""
    import pyarrow as pa
    from magic_content_extractor_ray.stages.stats import grouped_quantiles

    out = grouped_quantiles(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["lang", "n_chars"]),
        key_column="lang", value_column="n_chars", quantiles=(0.5,))

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({"lang": batch.column("lang"),
                         "median_chars": batch.column("q_0_5")})

    return out.map_batches(rename, batch_format="pyarrow").sort("lang")


def q_top_docs_per_lang(sf_dir: str):
    """Per-group top-k (rank() ≤ 3 analog): the 3 longest docs per lang.
    TREE reduction: per-batch partial top-k (K rows/lang/batch), then a
    second wide-batch partial pass so the final per-lang group is bounded
    by K × (candidates/8192) — without it the final group grows linearly
    with batch count (K rows per input batch per lang)."""
    import pandas as pd
    import pyarrow as pa

    K = 3

    def partial(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_chars", "descending"),
                                   ("doc_id", "ascending")], k=K,
                           group="lang")

    def final(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True]).head(K)
        g = g.reset_index(drop=True)
        g["rnk"] = range(1, len(g) + 1)
        return g[["lang", "rnk", "doc_id", "n_chars"]]

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["lang", "doc_id", "n_chars"])
    cands = ds.map_batches(partial, batch_format="pyarrow")
    cands = cands.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)  # tree-reduce the stream
    return cands.groupby("lang").map_groups(
        final, batch_format="pandas").sort(["lang", "rnk"])


def q_customers_no_purchases(sf_dir: str):
    """ANTI join: customers who never fired a 'purchase' event — distinct
    purchaser ids (pre-aggregated, so the join's right side is one row per
    purchaser), LEFT OUTER hash join, keep the null side."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count
    from magic_content_extractor_ray.stages.join import hash_join

    from magic_content_extractor_ray.stages.window import hash_agg

    def _p_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("user_id").aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    purchasers = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["event_type", "user_id"],
                 ).filter(expr="event_type == 'purchase'").map_batches(
            _p_partial, batch_format="pyarrow", batch_size=65536),
        "user_id", [("n", "sum", "n")]).map_batches(
        lambda t: pa.table({"c_custkey": t.column("user_id"),
                            "n": t.column("n")}),
        batch_format="pyarrow")
    cust = _read_pq(f"{sf_dir}/customer.parquet",
                    columns=["c_custkey"]).map_batches(
        lambda t: t.append_column("one", pa.array([1] * len(t), pa.int64())),
        batch_format="pyarrow")

    _i64 = pa.int64()
    joined = hash_join(cust, purchasers, key="c_custkey",
                       left_cols=["one"], right_cols=["n"], how="left",
                       left_types={"c_custkey": _i64, "one": _i64},
                       right_types={"c_custkey": _i64, "n": _i64})

    def keep_antis(batch: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": batch.filter(
            pc.is_null(batch.column("n"))).column("c_custkey")})

    return joined.map_batches(keep_antis, batch_format="pyarrow").sort(
        "c_custkey")


def q_lang_stats(sf_dir: str):
    """Grouped aggregate with partial pre-aggregation inside map_batches
    (the combiner pattern — the shuffle moves one row per lang per batch)."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # select generated aggregate columns BY NAME: the key column's
        # position in group_by output has differed across pyarrow versions
        g = batch.group_by("lang").aggregate(
            [("n_chars", "sum"), ("doc_id", "count")])
        return pa.table({
            "lang": g.column("lang"),
            "total_chars": g.column("n_chars_sum"),
            "n_docs": pc.cast(g.column("doc_id_count"), pa.int64()),
        })

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("lang").aggregate(
        Sum("total_chars", alias_name="total_chars"),
        Sum("n_docs", alias_name="n_docs"),
    ).sort("lang")


def q_long_docs(sf_dir: str):
    """Predicate pushdown at the read: only row groups passing the filter
    leave storage (pyarrow dataset expression, ray_guide sources)."""
    import pyarrow.compute as pc
    import ray.data as rd

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"],
        filter=(pc.field("n_chars") >= 400),
    ).sort("doc_id")


def q_top_docs(sf_dir: str):
    import ray.data as rd

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"],
    ).sort(["n_chars", "doc_id"], descending=[True, False]).limit(100)


def q_source_stats(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Min, Max

    return _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"],
    ).groupby("source").aggregate(
        Count(alias_name="n_docs"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    ).sort("source")


def q_events_by_type(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Min, Max

    return _read_pq(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"],
    ).groupby("event_type").aggregate(
        Count(alias_name="n_events"),
        Min("user_id", alias_name="min_user"),
        Max("user_id", alias_name="max_user"),
    ).sort("event_type")


def q_lineitem_pricing(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate over the widest table (600k rows at
    sf0.1): per-batch partial sums → small grouped reduce. Quantities are
    integral doubles, so the sum is order-independent and hash-exact."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = batch.select(
            ["l_returnflag", "l_linestatus", "l_quantity"]).group_by(
            ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_quantity", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": g.column("l_quantity_sum"),
            "n_rows": pc.cast(g.column("l_quantity_count"), pa.int64()),
        })

    ds = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("n_rows", alias_name="n_rows"),
    ).sort(["l_returnflag", "l_linestatus"])


def q_event_props(sf_dir: str):
    """JSON scalar extraction (§2.9 analog): pull the props JSON column's
    'k' field with a vectorized arrow regex (no per-row json.loads — the
    field is scalar-typed, so the regex is exact), bucket, grouped
    counts."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = batch.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k")
        t = pa.table({"k_bucket": pc.divide(
            pc.cast(ks, pa.int64()), 10)})
        g = t.group_by("k_bucket").aggregate([("k_bucket", "count")])
        return pa.table({
            "k_bucket": g.column("k_bucket"),
            "n_events": pc.cast(g.column("k_bucket_count"), pa.int64()),
        })

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["props"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        "k_bucket").aggregate(Sum("n_events", alias_name="n_events")).sort(
        "k_bucket")


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (SURVEY §2.10): events per (type, hour)
    bucket, pre-aggregated per batch before the grouped reduce."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch.column("ts"), pa.int64())
        hour = pc.divide(us, 3_600_000_000)
        batch = batch.append_column("hour_bucket", hour)
        g = batch.select(["event_type", "hour_bucket"]).group_by(
            ["event_type", "hour_bucket"]).aggregate([("hour_bucket", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "hour_bucket": g.column("hour_bucket"),
            "n_events": pc.cast(g.column("hour_bucket_count"), pa.int64()),
        })

    ds = _read_pq(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "hour_bucket"]).aggregate(
        Sum("n_events", alias_name="n_events"))


def q_events_by_segment(sf_dir: str):
    """Broadcast hash join: the small customer dim is ray.put once and
    looked up inside map_batches — no shuffle (ray_guide join pattern)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).sort_by(
        "c_custkey")
    # broadcast the dim as SORTED parallel arrays: the per-batch lookup is
    # one vectorized np.searchsorted, not a Python dict.get per row
    lookup_ref = ray.put({
        "keys": np.asarray(cust.column("c_custkey").to_numpy()),
        "vals": np.asarray(cust.column("c_mktsegment").to_pylist(),
                           dtype=object),
    })

    class SegmentJoin:
        def __init__(self):
            lk = ray.get(lookup_ref)
            self.keys, self.vals = lk["keys"], lk["vals"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            users = batch.column("user_id").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.keys, users)
            pos = np.clip(pos, 0, len(self.keys) - 1)
            hit = self.keys[pos] == users
            segs = np.where(hit, self.vals[pos], "UNKNOWN")
            t = pa.table({"c_mktsegment": pa.array(segs.tolist(),
                                                   pa.string())})
            g = t.group_by("c_mktsegment").aggregate(
                [("c_mktsegment", "count")])
            return pa.table({
                "c_mktsegment": g.column("c_mktsegment"),
                "n_events": pc.cast(g.column("c_mktsegment_count"),
                                    pa.int64()),
            })

    ds = _read_pq(f"{sf_dir}/events.parquet", columns=["user_id"])
    return ds.map_batches(SegmentJoin, batch_format="pyarrow",
                          concurrency=_pool()).groupby(
        "c_mktsegment").aggregate(
        Sum("n_events", alias_name="n_events")).sort("c_mktsegment")


def q_user_sessions(sf_dir: str):
    """Sessionization (30-min inactivity gap) per user: a per-key ordered
    window computed in groupby().map_groups over ts-sorted groups."""
    import numpy as np
    import pyarrow as pa
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, ts_us, col_np)

    GAP_US = 1800 * 1_000_000

    def sessions(t: pa.Table) -> pa.Table:
        n = len(t)
        uid = col_np(t, "user_id")
        us = ts_us(t.column("ts"))
        starts = segment_starts(uid)
        new_user = np.zeros(n, dtype=bool)
        new_user[starts] = True
        is_start = new_user.copy()
        is_start[1:] |= (us[1:] - us[:-1]) > GAP_US
        # sessions per user = count of session starts in the user segment
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "n_sessions": pa.array(
                np.add.reduceat(is_start.astype(np.int64), starts),
                pa.int64()),
        })

    return map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]),
        "user_id", sessions, sort_cols=["ts"],
    ).sort("user_id")


def q_orders_by_segment(sf_dir: str):
    """Big-big partitioned hash join (stages/join.py): orders ⋈ customer on
    custkey (one bucket-groupby shuffle), then grouped counts."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count
    from magic_content_extractor_ray.stages.join import hash_join

    orders = _read_pq(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_custkey"])
    cust = _read_pq(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"o_custkey": t.column("c_custkey"),
                            "c_mktsegment": t.column("c_mktsegment")}),
        batch_format="pyarrow")
    joined = hash_join(orders, cust, key="o_custkey",
                       left_cols=["o_orderkey"],
                       right_cols=["c_mktsegment"],
                       right_types={"o_custkey": pa.int64(),
                                    "c_mktsegment": pa.string()})
    return joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders")).sort("c_mktsegment")


def q_distinct_users(sf_dir: str):
    """Exact distinct-user count per event type (the oracle-checkable twin
    of the HLL sketch in stages/sketch.py, which the tests validate to
    ~1.6% error; exact here so DuckDB can hash-match).

    Scale shape: event_type has ~5 values, so a plain groupby(event_type)
    would pull ~20% of a 100 TB table into one task. Instead: per-batch
    distinct (event_type, user_id) pairs → composite-key groupby (spread
    over user_id, no hot key) → per-batch partial user counts → tiny
    grouped sum. No group ever exceeds one composite key's rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by("event_type").aggregate([("user_id", "count")])
        return pa.table({
            "event_type": g.column("event_type"),
            "n_users": pc.cast(g.column("user_id_count"), pa.int64()),
        })

    ds = _read_pq(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    from magic_content_extractor_ray.stages.window import hash_agg

    # hash_agg: |event_type x user| pairs are entity-cardinality
    distinct = hash_agg(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        "user_id", [("user_id", "count_all", "_n")],
        group_cols=["user_id", "event_type"])
    return distinct.map_batches(
        partial_counts, batch_format="pyarrow",
    ).groupby("event_type").aggregate(
        Sum("n_users", alias_name="n_users")).sort("event_type")


def q_asof_join(sf_dir: str):
    """As-of join (custom operator the Dataset API lacks): each click event
    matched to the user's most recent prior view (ties inclusive, like
    ``merge_asof(direction='backward')``). Arrow-native partition path:
    inside each hash partition, (user, ts) collapse into ONE user-major
    composite rank key, and a single vectorized ``searchsorted`` of all
    click keys into all view keys resolves every user's as-of match at
    once — no per-key callback, no pandas. Partitioning assumption:
    user_id co-location, provided by the bucket groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, ts_us, col_np)

    def asof(t: pa.Table) -> pa.Table:
        uid = col_np(t, "user_id")
        us = ts_us(t.column("ts"))
        eid = col_np(t, "event_id").astype(np.int64)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_c = pc.equal(et, "click").to_numpy(zero_copy_only=False)
        is_v = pc.equal(et, "view").to_numpy(zero_copy_only=False)
        # dense user ranks (rows are user-sorted) + dense ts ranks →
        # user-major composite key: strictly ordered by (user, ts)
        starts = segment_starts(uid)
        urank = np.zeros(len(t), np.int64)
        urank[starts] = 1
        urank = np.cumsum(urank) - 1
        uniq_ts = np.unique(us)
        m = np.int64(len(uniq_ts) + 2)
        comp = urank * m + np.searchsorted(uniq_ts, us)
        v_comp, v_eid, v_urank = comp[is_v], eid[is_v], urank[is_v]
        c_comp, c_eid, c_urank = comp[is_c], eid[is_c], urank[is_c]
        # last view with comp <= click comp; valid only if it belongs to
        # the same user's key band
        pos = np.searchsorted(v_comp, c_comp, side="right") - 1
        lo = np.searchsorted(v_urank, c_urank, side="left")
        valid = pos >= lo
        return pa.table({
            "click_id": pa.array(c_eid[valid], pa.int64()),
            "view_id": pa.array(v_eid[pos[valid]], pa.int64())})

    return map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "event_type", "ts", "event_id"]),
        "user_id", asof, sort_cols=["ts", "event_id"]).sort("click_id")


_ANN_NQ = 5
_ANN_K = 10


def q_ann_topk(sf_dir: str):
    """Exact cosine top-k; dtype='float64' threads double precision through
    the whole partial-top-k path so ranks match DuckDB's double
    accumulation; ties broken on neighbor_id."""
    import ray.data as rd
    from magic_content_extractor_ray.stages.ann import (
        brute_force_topk, load_queries)

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, queries, k=_ANN_K, dtype="float64")
    return out[["query_id", "neighbor_id", "rank"]]


def q_ann_filtered(sf_dir: str):
    """FILTERED vector search (the standard metadata-constrained RAG
    query): exact cosine top-k restricted to label < 5, with the label
    predicate PUSHED TO THE SCAN — the ANN stage only ever sees the
    qualifying rows, so filter selectivity directly cuts compute."""
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.ann import (
        brute_force_topk, load_queries)

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding", "label"],
                  filter=(pc.field("label") < 5)).select_columns(
        ["vec_id", "embedding"])
    out = brute_force_topk(ds, queries, k=_ANN_K, dtype="float64")
    return out[["query_id", "neighbor_id", "rank"]]


def q_sq8_topk(sf_dir: str):
    """INT8 scalar-quantized vector search (the SQ8 codec of
    FAISS/ScaNN): per-dim (min,max) grid → 0..255 codes → top-k by
    INT64 quantized inner product. Integer scores are exact in any
    summation order, so ranks are engine-independent — the SQL twin
    recomputes grid, codes and scores from scratch (no float near-tie
    risk; ties break on neighbor_id). Self-asserts recall@k ≥ 0.8 vs
    the exact float64 cosine top-k every run."""
    from magic_content_extractor_ray.stages.ann import (
        brute_force_topk, load_queries, sq8_topk)

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    out = sq8_topk(ds, queries, k=_ANN_K)
    exact = brute_force_topk(ds, queries, k=_ANN_K, dtype="float64",
                             normalize=False)
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    hits = sum((q, n) in exact_pairs
               for q, n in zip(out["query_id"], out["neighbor_id"]))
    if hits / max(1, len(exact_pairs)) < 0.8:
        raise AssertionError(
            f"sq8 recall@{_ANN_K} = {hits / len(exact_pairs):.3f} < 0.8 "
            "vs exact float64 inner-product top-k")
    return out


def q_kcenter_sample(sf_dir: str):
    """DIVERSITY sampling: greedy farthest-point (Gonzalez) k-center
    seeds over the SQ8-quantized embeddings — 8 maximally-spread
    exemplars, the standard coreset/facility-location seed step for
    diverse data selection. Exact integer squared-L2 on the codes makes
    the greedy trajectory reproducible across engines; the SQL twin
    unrolls the same 8 argmax-of-min-distance rounds."""
    from magic_content_extractor_ray.stages.ann import kcenter_select

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    return kcenter_select(ds, k=8)


def _ann_recall_checked(approx, sf_dir: str, queries, *,
                        min_recall: float = 0.9):
    """Join an approximate-ANN result with the exact float64 brute-force
    top-k (the independently-SQL-oracled ann_topk algorithm) computed on
    the same input: adds ``in_exact_topk`` per row and RAISES if overall
    recall@k falls below ``min_recall`` — so every run of the approximate
    operators (driver correctness, bench, tests) self-asserts against
    independent ground truth instead of relying on the frozen snapshot
    alone. Driver-side work is bounded: nq × k rows per side."""
    import pandas as pd
    from magic_content_extractor_ray.stages.ann import brute_force_topk

    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, queries, k=_ANN_K, dtype="float64")
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    out = approx.to_pandas() if hasattr(approx, "to_pandas") else approx
    out = out.copy()
    out["in_exact_topk"] = [
        int((q, n) in exact_pairs)
        for q, n in zip(out["query_id"], out["neighbor_id"])]
    recall = out["in_exact_topk"].sum() / max(1, len(exact_pairs))
    if recall < min_recall:
        raise AssertionError(
            f"approximate ANN recall@{_ANN_K} = {recall:.3f} < "
            f"{min_recall} vs exact brute-force top-k")
    return out.sort_values(["query_id", "rank"]).reset_index(drop=True)


def q_ann_ivf(sf_dir: str):
    """IVF ANN with an in-query recall assertion vs the exact float64
    brute-force top-k (see _ann_recall_checked)."""
    from magic_content_extractor_ray.stages.ann import ivf_topk, load_queries

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    out = ivf_topk(ds, queries, k=_ANN_K, n_centroids=16, nprobe=6)
    return _ann_recall_checked(out, sf_dir, queries)


def q_ann_lsh(sf_dir: str):
    """LSH ANN with an in-query recall assertion vs the exact float64
    brute-force top-k (see _ann_recall_checked)."""
    from magic_content_extractor_ray.stages.ann import lsh_topk, load_queries

    queries = load_queries(sf_dir, _ANN_NQ)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    # 24×4-bit tables, not 12×6: 6-bit sign patterns over these
    # embeddings bucket too finely for the true neighbors to collide
    # (measured recall@10 at sf0.01: 0.48 vs 0.98 here)
    out = lsh_topk(ds, queries, k=_ANN_K, n_tables=24, n_bits=4)
    return _ann_recall_checked(out, sf_dir, queries)


def q_views_before_click(sf_dir: str):
    """RANGE join (interval join): for each click, the number of the same
    user's views in the preceding 24 hours. Arrow-native partition path:
    one user-major composite-rank key per row, then TWO vectorized
    searchsorteds of all click window bounds into all view keys count
    every user's window at once (the bucketed range-join pattern with no
    per-key callback; cross-user bleed is impossible because each user
    owns a disjoint composite band)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, ts_us, col_np)

    W_US = 24 * 3600 * 1_000_000

    def windows(t: pa.Table) -> pa.Table:
        uid = col_np(t, "user_id")
        us = ts_us(t.column("ts"))
        eid = col_np(t, "event_id").astype(np.int64)
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        is_c = pc.equal(et, "click").to_numpy(zero_copy_only=False)
        is_v = pc.equal(et, "view").to_numpy(zero_copy_only=False)
        starts = segment_starts(uid)
        urank = np.zeros(len(t), np.int64)
        urank[starts] = 1
        urank = np.cumsum(urank) - 1
        uniq_ts = np.unique(us)
        m = np.int64(len(uniq_ts) + 2)
        v_comp = (urank * m + np.searchsorted(uniq_ts, us))[is_v]
        c_ts, c_urank, c_eid = us[is_c], urank[is_c], eid[is_c]
        # rank-map the window bounds; 'left' preserves [ct-W, ct) exactly
        hi = c_urank * m + np.searchsorted(uniq_ts, c_ts)
        lo = c_urank * m + np.searchsorted(uniq_ts, c_ts - W_US)
        n = (np.searchsorted(v_comp, hi, side="left")
             - np.searchsorted(v_comp, lo, side="left"))
        keep = n > 0  # inner-join semantics: clicks with ≥1 prior view
        return pa.table({
            "click_id": pa.array(c_eid[keep], pa.int64()),
            "n_prior_views": pa.array(n[keep].astype(np.int64),
                                      pa.int64())})

    return map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "event_type", "ts", "event_id"]),
        "user_id", windows, sort_cols=["ts", "event_id"]).sort("click_id")


def q_training_pipeline(sf_dir: str):
    """The COMPOSED training-data preprocessing job (quality gate → exact
    dedup semi-join → MinHash near-dup pruning → sequence packing) as one
    streaming pipeline — pipelines/training_pipeline.py. Rows-only check
    (FFD packing is not SQL-expressible); each constituent operator has
    its own oracle/test elsewhere."""
    from magic_content_extractor_ray.pipelines.training_pipeline import (
        run_training_pipeline)

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "text"])
    packs, _ = run_training_pipeline(ds, budget=1024, collect_funnel=False)
    return packs.drop_columns(["doc_ids"]).sort("pack_key")


def q_embedding_clusters(sf_dir: str):
    """Distributed k-means over the embeddings table (stages/cluster.py):
    fit 8 spherical centroids (mergeable partial sums — the shuffle never
    carries vectors), assign every vector, return per-cluster sizes.
    Not SQL-expressible (iterative algorithm) — rows-only check; the
    pytest blob-recovery + determinism tests pin correctness."""
    import ray.data as rd
    from ray.data.aggregate import Count
    from magic_content_extractor_ray.stages.cluster import (
        kmeans_fit, assign_clusters)

    # kmeans_fit streams the input once per iteration (+ init and the
    # final assignment): pin the projected columns in the object store
    # so those 6 passes don't re-decode the parquet list<float> column
    # each time (the semantic_dedup precedent; 32 s → ~8 s at sf0.1)
    ds = _read_pq(f"{sf_dir}/embeddings.parquet",
                  columns=["vec_id", "embedding"]).materialize()
    centroids = kmeans_fit(ds, k=8, iters=4)
    return assign_clusters(ds, centroids).groupby("cluster").aggregate(
        Count(alias_name="n_vectors")).sort("cluster")


def q_extract_metrics(sf_dir: str):
    """Per-platform pipeline metrics (the lineage/metrics aggregate over
    the extraction output): doc/span counts, total text, error count —
    partial-aggregated per batch before the tiny grouped reduce."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.append_column(
            "n_errors",
            pc.cast(pc.not_equal(batch.column("error"), ""), pa.int64()))
        batch = batch.append_column(
            "n_docs", pa.array([1] * len(batch), pa.int64()))
        g = batch.select(
            ["platform", "n_docs", "span_count", "text_len", "n_errors"]
        ).group_by("platform").aggregate(
            [("n_docs", "sum"), ("span_count", "sum"), ("text_len", "sum"),
             ("n_errors", "sum")])
        return pa.table({
            "platform": g.column("platform"),
            "n_docs": g.column("n_docs_sum"),
            "n_spans": pc.cast(g.column("span_count_sum"), pa.int64()),
            "total_text_len": g.column("text_len_sum"),
            "n_errors": g.column("n_errors_sum"),
        })

    partials = _extracted(sf_dir).map_batches(partial, batch_format="pyarrow")
    return partials.groupby("platform").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_spans", alias_name="n_spans"),
        Sum("total_text_len", alias_name="total_text_len"),
        Sum("n_errors", alias_name="n_errors"),
    ).sort("platform")


def q_extract_readability(sf_dir: str):
    """Alternate ReadabilityPlus strategy over the same corpus
    (strategy-override dispatch path)."""
    out = _extracted(sf_dir, strategy_override="readability")
    return out.select_columns(
        ["doc_id", "strategy_used", "title", "text_len", "span_count",
         "error"]).sort("doc_id")


def q_media_features(sf_dir: str):
    from magic_content_extractor_ray.stages.multimodal import media_pipeline

    # fake=False: every image payload is a real PNG → real stdlib decode
    out = media_pipeline(_extracted(sf_dir), fake=False)
    return out.select_columns(
        ["media_ref", "kind", "width", "height", "pixel_mean"]).sort(
        "media_ref")


def q_distinct_users_approx(sf_dir: str):
    """Approximate per-group distinct count via mergeable HyperLogLog
    sketches (2^12 registers per batch on the wire, never the values) —
    the unbounded-cardinality twin of the exact `distinct_users` oracle
    query. Rows-only: the estimate is within the ±~1.6% HLL band of the
    exact counts (asserted by test_grouped_hll)."""
    from magic_content_extractor_ray.stages.sketch import (
        approx_distinct_by_group)

    return approx_distinct_by_group(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["event_type", "user_id"]),
        "event_type", "user_id").sort("event_type")


def q_audio_features(sf_dir: str):
    """Audio path end-to-end through the driver surface: synthesize one
    audio ref per document (deterministic), fetch REAL WAV payloads
    (stdlib codec), decode + per-frame RMS features in the actor pool.
    Rows-only check (signal features aren't SQL-expressible); the
    codec/feature math is pinned by test_wav_codec_and_audio_features."""
    import pyarrow as pa
    from magic_content_extractor_ray.stages.multimodal import (
        fetch_media_stub, AudioFeatures)

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        refs = [f"https://media.example/{i}/audio-0.wav"
                for i in ids.to_pylist()]
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(["audio"] * len(batch), pa.string()),
        })

    out = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
    ).map_batches(to_refs, batch_format="pyarrow").map_batches(
        fetch_media_stub, batch_format="pyarrow", batch_size=64,
    ).map_batches(AudioFeatures, batch_format="pyarrow", batch_size=64,
                  concurrency=_pool())
    return out.select_columns(
        ["media_ref", "duration_ms", "rms_mean", "rms_peak",
         "n_frames"]).sort("media_ref")


def q_checkpoint_lineage(sf_dir: str):
    """Run the checkpointed pipeline into /tmp (2 partitions) and surface
    the per-partition lineage records."""
    import os
    import shutil
    import pandas as pd
    from magic_content_extractor_ray.state.checkpoint import (
        run_checkpointed, make_fragment_docs_factory)

    out_dir = "/tmp/mce_ray_ckpt_query"
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)

    recs = run_checkpointed(
        make_fragment_docs_factory(sf_dir), out_dir, num_partitions=2)
    return pd.DataFrame(recs)[
        ["partition_id", "num_docs", "num_spans", "num_errors",
         "total_text_len"]]


def q_source_mixture(sf_dir: str):
    """Data mixing WITH upsampling (the training-mixture op stratified
    sampling can't express): per-source integer rates where 250 → 2.5×
    (two copies of every row, a deterministic hash-selected half a
    third), 60 → 0.6× down-sample, 0 → source dropped, default 100 →
    identity. Shuffle-free md5 predicate, resume-safe, identical at any
    parallelism; replica index emitted for downstream decorrelation."""
    from magic_content_extractor_ray.stages.sample import upsample_mixture

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "source"])
    return upsample_mixture(
        ds, key_column="source",
        rate_pcts={"src0": 250, "src1": 130, "src2": 60, "src3": 0},
        default_pct=100,
    ).sort(["doc_id", "copy"])


def q_page_rank(sf_dir: str):
    """Distributed PageRank (iterative graph algorithm — the web-scale
    ranking primitive of the reference's domain) over the per-user event
    transition graph: ``props.k`` values are nodes, and each user's
    consecutive events in (ts, event_id) order contribute one src→dst
    edge. 10 damped power iterations via ``stages/pagerank.py``
    (broadcast mode: the edge list streams through map_batches partial
    dst-sums, only the |V|-sized rank vector is broadcast per
    iteration). Ranks are emitted as half-away-rounded 1e8-scaled
    integers so the DuckDB oracle — the same recurrence unrolled as 10
    chained CTEs — compares exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from magic_content_extractor_ray.stages.pagerank import pagerank
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, col_np)

    def with_k(batch: pa.Table) -> pa.Table:
        col = batch.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64())
        return pa.table({"user_id": batch.column("user_id"),
                         "ts": batch.column("ts"),
                         "event_id": batch.column("event_id"),
                         "k": ks})

    def edges(t: pa.Table) -> pa.Table:
        uid = col_np(t, "user_id")
        k = col_np(t, "k")
        same = uid[1:] == uid[:-1]
        return pa.table({
            "src": pa.array(k[:-1][same], pa.int64()),
            "dst": pa.array(k[1:][same], pa.int64())})

    e = map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "ts", "event_id", "props"]
                 ).map_batches(with_k, batch_format="pyarrow"),
        "user_id", edges, sort_cols=["ts", "event_id"])
    pr = pagerank(e, damping=0.85, n_iter=10)
    r = pr.column("rank").to_numpy()
    return pa.table({
        "node": pr.column("node"),
        "pr_e8": pa.array(np.floor(r * 1e8 + 0.5).astype(np.int64),
                          pa.int64())})


def _page_rank_sql(damping: float = 0.85, n_iter: int = 10) -> str:
    """The broadcast recurrence unrolled as chained CTEs — an
    INDEPENDENT restatement DuckDB executes dense, term order matched
    (r/ow*w) so FP drift stays far inside the 1e-8 rounding grain."""
    sql = ("WITH seq AS (SELECT user_id, "
           "CAST(json_extract(props, '$.k') AS BIGINT) AS k, "
           "LEAD(CAST(json_extract(props, '$.k') AS BIGINT)) OVER "
           "(PARTITION BY user_id ORDER BY ts, event_id) AS nk "
           "FROM events), "
           "edges AS (SELECT k AS src, nk AS dst, "
           "CAST(count(*) AS DOUBLE) AS w FROM seq "
           "WHERE nk IS NOT NULL GROUP BY 1, 2), "
           "nodes AS (SELECT src AS node FROM edges "
           "UNION SELECT dst FROM edges), "
           "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), "
           "outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1), "
           "r0 AS (SELECT node, 1.0/(SELECT n FROM nv) AS r FROM nodes)")
    base_lit = repr(1.0 - damping)
    d_lit = repr(damping)
    for i in range(1, n_iter + 1):
        sql += (f", r{i} AS (SELECT n.node, "
                f"CAST({base_lit} AS DOUBLE)/(SELECT n FROM nv) + "
                f"{d_lit}*coalesce(c.s, 0) AS r FROM nodes n "
                f"LEFT JOIN (SELECT e.dst, sum(p.r / o.ow * e.w) AS s "
                f"FROM edges e JOIN outw o ON o.src = e.src "
                f"JOIN r{i-1} p ON p.node = e.src GROUP BY e.dst) c "
                f"ON c.dst = n.node)")
    sql += (f" SELECT node, CAST(floor(r * 1e8 + 0.5) AS BIGINT) "
            f"AS pr_e8 FROM r{n_iter} ORDER BY node")
    return sql


def q_regional_revenue(sf_dir: str):
    """TPC-H Q5 shape (local-supplier revenue): revenue per nation where
    the CUSTOMER and the LINEITEM's SUPPLIER sit in the same in-region
    nation. supplier/nation/region are broadcast dimension lookups
    (dense int arrays, `ray.put` once); orders⋈customer and
    (orders⋈customer)⋈lineitem are the two PARTITIONED hash joins — the
    full big-big shuffle path, complementing shipping_priority's
    broadcast-semi-filter variant. Customers outside the region are
    dropped map-side BEFORE join #1's shuffle (semi-filter pushdown),
    revenue is exact integer cents×pct, and per-batch partials precede
    the final nation-keyed groupby (bounded: 25 nations)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import ts_us

    lo_us = int(np.datetime64("1996-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))
    hi_us = int(np.datetime64("1998-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = reg.filter(pc.equal(reg.column("r_name"), "EUROPE")).column(
        "r_regionkey")[0].as_py()
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nkeys = nat.column("n_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    region_nations = np.zeros(int(nkeys.max()) + 1, dtype=bool)
    in_reg = nat.column("n_regionkey").to_numpy(
        zero_copy_only=False).astype(np.int64) == rk
    region_nations[nkeys[in_reg]] = True
    nation_names = np.array(
        [""] * (int(nkeys.max()) + 1), dtype=object)
    nation_names[nkeys] = nat.column("n_name").to_pylist()
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    skeys = sup.column("s_suppkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    sup_nat = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    sup_nat[skeys] = sup.column("s_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    reg_ref = ray.put(region_nations)
    sup_ref = ray.put(sup_nat)

    def ords_side(t: pa.Table) -> pa.Table:
        us = ts_us(t.column("o_orderdate"))
        keep = (us >= lo_us) & (us < hi_us)
        t = t.filter(pa.array(keep))
        return pa.table({
            "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "l_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
        })

    def cust_side(t: pa.Table) -> pa.Table:
        rn = ray.get(reg_ref)
        nk = t.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = (nk >= 0) & (nk < len(rn)) & rn[nk]
        return pa.table({
            "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
            "c_nationkey": pa.array(nk, pa.int64()),
        }).filter(pa.array(keep))

    ords = _read_pq(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_custkey", "o_orderdate"]
                    ).map_batches(ords_side, batch_format="pyarrow")
    cust = _read_pq(f"{sf_dir}/customer.parquet",
                    columns=["c_custkey", "c_nationkey"]
                    ).map_batches(cust_side, batch_format="pyarrow")
    i64 = pa.int64()
    j1 = hash_join(ords, cust, key="c_custkey",
                   left_cols=["l_orderkey"], right_cols=["c_nationkey"],
                   left_types={"c_custkey": i64, "l_orderkey": i64},
                   right_types={"c_custkey": i64, "c_nationkey": i64})

    def li_side(t: pa.Table) -> pa.Table:
        sn = ray.get(sup_ref)
        rn = ray.get(reg_ref)
        sk = t.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nk = np.where((sk >= 0) & (sk < len(sn)), sn[np.clip(
            sk, 0, len(sn) - 1)], -1)
        keep = (nk >= 0) & rn[np.clip(nk, 0, len(rn) - 1)]
        t = t.filter(pa.array(keep))
        nk = nk[keep]
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
            pa.scalar(1.0), t.column("l_discount")), 100)), pa.int64())
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "s_nat": pa.array(nk, pa.int64()),
            "rev": pc.multiply(price_c, disc_pct),
        })

    li = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                           "l_discount"]
                  ).map_batches(li_side, batch_format="pyarrow")
    j2 = hash_join(j1, li, key="l_orderkey",
                   left_cols=["c_nationkey"], right_cols=["s_nat", "rev"],
                   left_types={"l_orderkey": i64, "c_nationkey": i64},
                   right_types={"l_orderkey": i64, "s_nat": i64,
                                "rev": i64})

    def finish(t: pa.Table) -> pa.Table:
        names = ray.get(name_ref)
        keep = pc.equal(t.column("c_nationkey"), t.column("s_nat"))
        t = t.filter(keep)
        nk = t.column("s_nat").to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = pa.table({
            "n_name": pa.array(names[nk].astype(str)),
            "rev": t.column("rev"),
        }).group_by("n_name").aggregate([("rev", "sum")])
        return pa.table({"n_name": g.column("n_name"),
                         "revenue_c4": g.column("rev_sum")})

    name_ref = ray.put(nation_names)
    return j2.map_batches(finish, batch_format="pyarrow").groupby(
        "n_name").aggregate(Sum("revenue_c4", alias_name="revenue_c4")
                            ).sort(["revenue_c4", "n_name"],
                                   descending=[True, False])


def _covis_pair_counts(sf_dir: str):
    """Shared co-view pair-count pipeline (q_covisitation, q_item_bfs):
    distinct (user, item) from view events, per-user unordered item
    pairs via the vectorized triangular-index decode, PACKED int64 pair
    keys, per-partition partial counts, hash_sum combiner. Returns a
    Dataset (pk, n_users); per-user fan-out is bounded by the
    MAX_USER_ITEMS hub cap (see _cap_user_items)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_sum, map_key_partitions, segment_lengths, segment_starts)

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks,
        })
        # map-side (user, item) pre-dedup shrinks the partition shuffle
        return out.group_by(["user_id", "item"]).aggregate([])

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        it = t.column("item").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(u) and (it.min() < 0 or it.max() >= (1 << 31)):
            raise ValueError("covisitation packs item pairs into one "
                             "int64; item ids must be in [0, 2^31)")
        keep = np.ones(len(u), dtype=bool)
        if len(u) > 1:  # rows sorted by (user, item): adjacent dedup
            keep[1:] = (u[1:] != u[:-1]) | (it[1:] != it[:-1])
        u, it = _cap_user_items(u[keep], it[keep])
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
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
            (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0)
             - 1.0) / 2.0)).astype(np.int64)
        b = tloc + a + 1 - length * (length - 1) // 2 \
            + (length - a) * (length - a - 1) // 2
        base = starts[seg]
        pk = (it[base + a] << np.int64(31)) | it[base + b]
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(pku, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    # hash_sum, not groupby().aggregate(Sum): one group per item PAIR is
    # row-scale cardinality, where the sort-aggregate's per-group Python
    # callback dominates (2M pairs: 146 s → 4 s on 4 cpus)
    return hash_sum(
        map_key_partitions(ui, "user_id", pairs, sort_cols=["item"]),
        "pk", "c", "n_users")


def q_covisitation(sf_dir: str):
    """Item co-occurrence mining ("users who viewed X also viewed Y"):
    the shared _covis_pair_counts pipeline, then a bounded top-50 with
    Arrow-native per-batch candidate pruning."""
    import numpy as np
    import pyarrow as pa

    K = 50
    counts = _covis_pair_counts(sf_dir)

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_users", "descending"),
                                   ("pk", "ascending")], k=K)

    cands = counts.map_batches(partial_topk, batch_format="pyarrow",
                               batch_size=8192)
    df = cands.to_pandas().sort_values(
        ["n_users", "pk"], ascending=[False, True]).head(K)
    pk = df["pk"].to_numpy(dtype=np.int64)
    return pa.table({
        "item_a": pa.array(pk >> np.int64(31), pa.int64()),
        "item_b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64()),
        "n_users": pa.array(df["n_users"].to_numpy(dtype=np.int64),
                            pa.int64()),
    })


def q_centroid_assign(sf_dir: str):
    """Nearest-centroid classification (vector quantization / IVF-style
    assignment) with an EXACT SQL twin: per-label centroids from the
    label_centroids sufficient statistics (bounded labels×dims rows on
    the driver), quantized to integer micro-units with an explicit
    floor((2s+n)/2n) rule both sides reproduce bit-for-bit, broadcast
    once, then one vectorized int64 distance matmul-shape pass per batch.
    Ties break to the smallest label in both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    stats = q_label_centroids(sf_dir).take_all()  # bounded: labels × dims
    labels = sorted({r["label"] for r in stats})
    dims = max(r["dim"] for r in stats)
    lab_ix = {lab: i for i, lab in enumerate(labels)}
    cm = np.zeros((len(labels), dims), dtype=np.int64)
    for r in stats:
        s, n = int(r["sum_micro"]), int(r["n_vals"])
        cm[lab_ix[r["label"]], r["dim"] - 1] = int(
            np.floor((2.0 * s + n) / (2.0 * n)))
    cent_ref = ray.put(cm)
    labels_arr = np.array(labels, dtype=np.int64)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(
            zero_copy_only=False).astype(np.float64)
        v = flat * 1e6
        xm = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(
            np.int64).reshape(len(batch), -1)
        # (n, L) int64 distances — exact, order-independent
        d = ((xm[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d, axis=1)  # first minimum = smallest label
        return pa.table({
            "vec_id": pc.cast(batch.column("vec_id"), pa.int64()),
            "pred_label": pa.array(labels_arr[best], pa.int64()),
            "dist_sq": pa.array(d[np.arange(len(d)), best], pa.int64()),
        })

    return _read_pq(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"]
                    ).map_batches(assign, batch_format="pyarrow",
                                  batch_size=2048).sort("vec_id")


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


def q_dup_passages(sf_dir: str):
    """Per-document duplicated-passage stats: distinct word-3-grams,
    how many are shared with ≥1 other doc, and the dup ratio — the
    doc-level repeated-passage signal behind substring-dedup pruning
    (stages/dedup.duplicate_passage_stats: ONE exchange on the ngram
    key, df computed as in-partition run lengths, no df table/join)."""
    from magic_content_extractor_ray.stages.dedup import (
        duplicate_passage_stats)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    return duplicate_passage_stats(docs, n=3, min_df=2).sort("doc_id")


def q_eval_overlap(sf_dir: str):
    """GPT-3-style n-gram overlap contamination score: for each eval
    doc (doc_id % 10 == 0), the fraction of its distinct 3-grams found
    anywhere in the train split (stages/decontam.ngram_overlap_scores:
    tagged union, ONE exchange on the ngram key, train-presence read
    off each sorted segment's first row)."""
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.decontam import (
        ngram_overlap_scores)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def side(want_eval: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            # doc_id % 10 == 0 (non-negative ids; arrow has no modulo)
            mod = pc.subtract(
                ids, pc.multiply(pc.divide(ids, 10), 10))
            is_eval = pc.equal(mod, 0)
            return t.filter(is_eval if want_eval else pc.invert(is_eval))

        return docs.map_batches(f, batch_format="pyarrow")

    return ngram_overlap_scores(side(False), side(True), n=3).sort("doc_id")


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


def q_big_orders(sf_dir: str):
    """TPC-H Q18 shape (large-quantity orders): per-order quantity sums
    with map-side combine, HAVING > 200, one partitioned hash_join back
    to orders, customer names appended from a broadcast dimension
    lookup (ray.put once, searchsorted per batch — join #2 never
    shuffles). Quantities are integral doubles → summed as int64, so
    the HAVING cutoff is exact on both engines."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.join import hash_join

    def li_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "qty_i": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
        })

    li = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_orderkey", "l_quantity"]).map_batches(
        li_side, batch_format="pyarrow")

    def having(part: pa.Table) -> pa.Table:
        # per-order sums via segment reduceat; the HAVING cutoff runs
        # INSIDE the partition task, so only qualifying orders leave it
        from magic_content_extractor_ray.stages.window import (
            segment_starts)

        keys = part.column("o_orderkey").to_numpy(zero_copy_only=False)
        if not len(keys):
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "total_qty": pa.array([], pa.int64())})
        q = part.column("qty_i").to_numpy(zero_copy_only=False)
        starts = segment_starts(keys)
        sums = np.add.reduceat(q, starts)
        keep = sums > 200
        return pa.table({
            "o_orderkey": pa.array(keys[starts][keep], pa.int64()),
            "total_qty": pa.array(sums[keep], pa.int64())})

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions)

    big = map_key_partitions(li, "o_orderkey", having,
                             coalesce_rows=131072)

    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey", "o_totalprice"])
    j = hash_join(orders, big, key="o_orderkey",
                  left_cols=["o_custkey", "o_totalprice"],
                  right_cols=["total_qty"],
                  right_types={"total_qty": pa.int64()})

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).sort_by(
        "c_custkey")
    keys_ref = ray.put(cust.column("c_custkey").to_numpy(
        zero_copy_only=False).astype(np.int64))
    names_ref = ray.put(np.asarray(cust.column("c_name").to_pylist(),
                                   dtype=object))

    def add_name(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        nm = ray.get(names_ref)
        ck = t.column("o_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(ks, ck), 0, max(len(ks) - 1, 0))
        return t.append_column("c_name", pa.array(nm[pos], pa.string()))

    return j.map_batches(add_name, batch_format="pyarrow").sort("o_orderkey")


def q_semantic_dedup(sf_dir: str):
    """SemDeDup-style semantic deduplication over the embeddings table
    (stages/cluster.semantic_dedup): k-means partitions the space, exact
    pairwise cosine runs only WITHIN clusters (O(n²/k), bounded per
    task), near-dup groups collapse to their min-id representative.
    Iterative k-means is not SQL-expressible — snapshot oracle; the
    planted-duplicate pytest pins semantics."""
    from magic_content_extractor_ray.stages.cluster import semantic_dedup

    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"])
    # the synthetic embeddings top out near cosine 0.51 (see
    # q_dedup_embedding); 0.4 keeps the dup groups non-trivial
    return semantic_dedup(emb, k=8, threshold=0.4).sort("vec_id")


def q_chars_quantiles_approx(sf_dir: str):
    """Mergeable histogram-quantile sketch over n_chars
    (stages/sketch.histogram_quantiles): one bounds aggregate + one
    (bucket, count) exchange of ≤1024 rows per block; all bucket/rank
    math is integer, so the SQL oracle reproduces the sketch estimate
    bit-for-bit (approximate vs truth, exact vs spec)."""
    from magic_content_extractor_ray.stages.sketch import (
        histogram_quantiles)

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    return histogram_quantiles(docs, "n_chars", n_buckets=1024,
                               qs=(0.5, 0.9, 0.99))


def q_mode_source(sf_dir: str):
    """Per-language modal source (most-frequent, ties to the
    lexicographically smallest) — per-batch Arrow partial counts, one
    exchange on lang, argmax inside the partition kernel."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "source"]).aggregate([("source", "count")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "c": pc.cast(g.column("source_count"), pa.int64())})

    parts = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["lang", "source"]).map_batches(
        partial, batch_format="pyarrow")

    def pick(part: pa.Table) -> pa.Table:
        langs = part.column("lang").to_numpy(zero_copy_only=False)
        out_l, out_s, out_n = [], [], []
        if len(langs):
            srcs = part.column("source").to_numpy(zero_copy_only=False)
            cs = part.column("c").to_numpy(zero_copy_only=False)
            starts = segment_starts(langs)
            lens = segment_lengths(starts, len(langs))
            for s, ln in zip(starts, lens):
                sl = slice(int(s), int(s + ln))
                # np.unique sorts sources → argmax's first hit IS the
                # lexicographically-smallest tie winner
                us, inv = np.unique(srcs[sl], return_inverse=True)
                tot = np.bincount(inv, weights=cs[sl]).astype(np.int64)
                w = int(np.argmax(tot))
                out_l.append(langs[s])
                out_s.append(str(us[w]))
                out_n.append(int(tot[w]))
        return pa.table({"lang": pa.array(out_l, pa.string()),
                         "mode_source": pa.array(out_s, pa.string()),
                         "n": pa.array(out_n, pa.int64())})

    return map_key_partitions(parts, "lang", pick).sort("lang")


def q_intra_dup_ngrams(sf_dir: str):
    """Gopher-style WITHIN-document repetition: the fraction of a doc's
    word-3-gram occurrences that belong to a 3-gram repeated inside the
    same doc (the 'duplicate n-gram fraction' pretraining filter) — the
    intra-doc complement of dup_passages' corpus-level signal. One
    vectorized map (two Arrow group_bys per batch), no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(t: pa.Table) -> pa.Table:
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
        n = len(flat)
        import numpy as np

        tot = np.zeros(len(t), np.int64)
        dup = np.zeros(len(t), np.int64)
        if n >= 3:
            parts = [flat.slice(i, n - 2) for i in range(3)]
            ngrams = pc.binary_join_element_wise(*parts, " ")
            head = parent.slice(0, n - 2)
            same = pc.equal(head, parent.slice(2, n - 2))
            ngrams = ngrams.filter(same)
            head = head.filter(same)
            g = pa.table({"row": head, "ng": ngrams}).group_by(
                ["row", "ng"]).aggregate([("ng", "count")])
            rows = g.column("row").to_numpy(
                zero_copy_only=False).astype(np.int64)
            cs = pc.cast(g.column("ng_count"), pa.int64()).to_numpy(
                zero_copy_only=False)
            tot = np.bincount(rows, weights=cs,
                              minlength=len(t)).astype(np.int64)
            dup = np.bincount(rows, weights=np.where(cs >= 2, cs, 0),
                              minlength=len(t)).astype(np.int64)
        ratio = np.zeros(len(t), np.float64)
        nz = tot > 0
        ratio[nz] = dup[nz] / tot[nz]
        out = pa.table({
            "doc_id": t.column("doc_id"),
            "n_ngrams": pa.array(tot, pa.int64()),
            "n_dup_occ": pa.array(dup, pa.int64()),
            "intra_dup_ratio": pa.array(
                np.floor(ratio * 1e6 + 0.5) / 1e6, pa.float64()),
        })
        return out.filter(pc.greater(out.column("n_ngrams"), 0))

    return _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow").sort("doc_id")


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


def q_lang_chars_quantiles(sf_dir: str):
    """Per-language approximate p50/p90 of n_chars via the grouped
    histogram-quantile sketch (stages/sketch.histogram_quantiles_by_group:
    one (group, bucket) combiner exchange on a shared global grid,
    per-group extraction in a partition kernel; all-integer math → the
    SQL twin reproduces every estimate bit-for-bit)."""
    import pyarrow as pa

    from magic_content_extractor_ray.stages.sketch import (
        histogram_quantiles_by_group)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["lang", "n_chars"])
    t = histogram_quantiles_by_group(docs, "lang", "n_chars",
                                     n_buckets=1024, qs=(0.5, 0.9))
    return pa.table({"lang": t.column("key"), "q": t.column("q"),
                     "est": t.column("est")})


def q_weighted_sample(sf_dir: str):
    """Efraimidis–Spirakis A-ES weighted sampling WITHOUT replacement:
    the 100 docs with the largest ln(u)/n_chars keys (u from md5(id)) —
    a length-proportional sample whose every draw, including the top-k
    cut, is reproduced bit-for-bit by the SQL twin
    (stages/sample.weighted_sample_aes: tree of per-batch top-k's)."""
    from magic_content_extractor_ray.stages.sample import (
        weighted_sample_aes)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])
    return weighted_sample_aes(docs, k=100, weight_column="n_chars",
                               salt="aes-1:")


def q_item_triangles(sf_dir: str):
    """Distributed triangle counting on the item co-view graph (edge =
    item pair co-viewed by ≥2 users). Edges are oriented low→high, so
    every triangle is generated EXACTLY ONCE as a wedge from its MIN
    vertex (one partition pass, np.triu_indices per vertex segment) and
    verified by one partitioned hash join against the edge set — the
    standard wedge-check shape; no vertex's work exceeds its degree².
    Per-USER pair emission is bounded by the MAX_USER_ITEMS hub cap
    (deterministic hash sample — see _cap_user_items).
    Returns per-item triangle participation counts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import (
        hash_sum, map_key_partitions, segment_lengths, segment_starts)

    MIN_SUP = 2
    MASK = (1 << 31) - 1

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks,
        })
        return out.group_by(["user_id", "item"]).aggregate([])

    def pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        it = t.column("item").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(u) and (it.min() < 0 or it.max() >= (1 << 31)):
            raise ValueError("item_triangles packs item pairs into one "
                             "int64; item ids must be in [0, 2^31)")
        keep = np.ones(len(u), dtype=bool)
        if len(u) > 1:
            keep[1:] = (u[1:] != u[:-1]) | (it[1:] != it[:-1])
        u, it = _cap_user_items(u[keep], it[keep])
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        out = []
        for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
            bs = it[int(s):int(s + ln)]  # sorted ascending within user
            iu, ju = np.triu_indices(int(ln), 1)
            out.append((bs[iu] << np.int64(31)) | bs[ju])
        pk = np.concatenate(out) if out else np.zeros(0, np.int64)
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(pku, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    # hash_sum (Arrow C++ per-partition sum), not the sort-aggregate:
    # pair-key cardinality is row-scale (see q_covisitation)
    counts = hash_sum(
        map_key_partitions(ui, "user_id", pairs, sort_cols=["item"],
                           coalesce_rows=131072),
        "pk", "c", "n_users")

    def unpack_edges(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        n = t.column("n_users").to_numpy(zero_copy_only=False)
        keep = n >= MIN_SUP
        pk = pk[keep]
        return pa.table({"a": pa.array(pk >> np.int64(31), pa.int64()),
                         "b": pa.array(pk & np.int64(MASK), pa.int64()),
                         "pk": pa.array(pk, pa.int64())})

    edges = counts.map_batches(
        unpack_edges, batch_format="pyarrow").materialize()  # used 2×

    def wedges(part: pa.Table) -> pa.Table:
        a = part.column("a").to_numpy(zero_copy_only=False)
        b = part.column("b").to_numpy(zero_copy_only=False)
        out_pk, out_a = [], []
        if len(a):
            starts = segment_starts(a)
            lens = segment_lengths(starts, len(a))
            for s, ln in zip(starts[lens >= 2], lens[lens >= 2]):
                bs = b[int(s):int(s + ln)]  # sorted (partition sort)
                iu, ju = np.triu_indices(int(ln), 1)
                out_pk.append((bs[iu] << np.int64(31)) | bs[ju])
                out_a.append(np.full(len(iu), a[int(s)], np.int64))
        pk = np.concatenate(out_pk) if out_pk else np.zeros(0, np.int64)
        av = np.concatenate(out_a) if out_a else np.zeros(0, np.int64)
        return pa.table({"pk": pa.array(pk, pa.int64()),
                         "apex": pa.array(av, pa.int64())})

    wedge_ds = map_key_partitions(edges, "a", wedges, sort_cols=["b"])

    # wedge (b, c) from apex a is a triangle iff (b, c) is an edge
    tris = hash_join(
        wedge_ds, edges.select_columns(["pk"]).map_batches(
            lambda t: t.append_column(
                "is_edge", pa.array([1] * len(t), pa.int64())),
            batch_format="pyarrow"),
        key="pk", left_cols=["apex"], right_cols=["is_edge"],
        left_types={"pk": pa.int64(), "apex": pa.int64()},
        right_types={"is_edge": pa.int64()})

    def explode_items(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        apex = t.column("apex").to_numpy(zero_copy_only=False)
        items = np.concatenate([apex, pk >> np.int64(31),
                                pk & np.int64(MASK)])
        return pa.table({"item": pa.array(items, pa.int64())})

    from magic_content_extractor_ray.stages.window import hash_agg

    def corner_partial(t: pa.Table) -> pa.Table:
        g = t.group_by("item").aggregate([([], "count_all")])
        return pa.table({"item": g.column("item"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    # hash_agg: the item domain is entity-cardinality at corpus scale
    return hash_agg(
        tris.map_batches(explode_items, batch_format="pyarrow"
                         ).map_batches(corner_partial,
                                       batch_format="pyarrow",
                                       batch_size=65536),
        "item", [("n", "sum", "n_triangles")]).sort("item")


def q_daily_revenue_ma7(sf_dir: str):
    """Frame-based window (ROWS 6 PRECEDING): 7-day moving average of
    exact-cent daily order revenue. Per-batch combiner partials shrink
    the exchange to one row per (block, day); the day series itself is
    DRIVER-SMALL by construction (one row per calendar day — years of
    data is thousands of rows), so the ordered convolution runs in one
    task. The moving average is kept in integer cents via centered
    integer division (half-away), so the SQL twin matches exactly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import ts_us

    def partial(batch: pa.Table) -> pa.Table:
        day = pa.array(ts_us(batch.column("o_orderdate"))
                       // 86_400_000_000, pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"day": day, "rev_c": cents}).group_by(
            ["day"]).aggregate([("rev_c", "sum")])
        return pa.table({"day": g.column("day"),
                         "rev_c": pc.cast(g.column("rev_c_sum"),
                                          pa.int64())})

    daily = _read_pq(f"{sf_dir}/orders.parquet",
                     columns=["o_orderdate", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow").groupby("day").aggregate(
        Sum("rev_c", alias_name="rev_c"))

    def ma(t: pa.Table) -> pa.Table:
        t = t.sort_by("day")
        rev = t.column("rev_c").to_numpy(zero_copy_only=False)
        cs = np.concatenate(([0], np.cumsum(rev)))
        n = len(rev)
        win_lo = np.maximum(0, np.arange(n) - 6)
        sums = cs[np.arange(n) + 1] - cs[win_lo]
        counts = np.arange(n) + 1 - win_lo
        # integer half-away division == round(sum/count) in cents
        ma_c = (2 * sums + counts) // (2 * counts)
        return pa.table({"day": t.column("day"),
                         "rev_c": t.column("rev_c"),
                         "ma7_c": pa.array(ma_c, pa.int64())})

    # ROWS-frame windows need the whole ordered series in one place;
    # repartition(1) is safe because the series is one row per day
    return daily.repartition(1).map_batches(
        ma, batch_format="pyarrow", batch_size=1 << 30).sort("day")


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


def q_dedup_keep_best(sf_dir: str):
    """Exact dedup with a KEEP-BEST policy (CCNet/RefinedWeb shape: of
    several exact copies, keep the one from the most-trusted source,
    not the min-id one) — stages/dedup.exact_dedup_keep_best resolves
    the whole (priority, id) argmin as one packed-int64 min through
    hash_agg. The synthetic corpus has no exact duplicates, so each
    doc with doc_id % 5 == 0 is first re-emitted under a different
    deterministic source (the DuckDB oracle performs the IDENTICAL
    augmentation), giving 100 two-copy groups whose winner is decided
    by the source-rank policy."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.dedup import (
        exact_dedup_keep_best)

    def augment(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        m = ids % 5 == 0
        dup = batch.filter(pa.array(m))
        dupids = ids[m]
        dup = dup.set_column(
            dup.schema.get_field_index("doc_id"), "doc_id",
            pa.array(dupids + 1000000, pa.int64()))
        dup = dup.set_column(
            dup.schema.get_field_index("source"), "source",
            pa.array(["src" + str(int(i * 7 + 3) % 25) for i in dupids],
                     pa.string()))
        return pa.concat_tables([batch, dup])

    def add_priority(batch: pa.Table) -> pa.Table:
        # source rank: 'srcN' → N (smaller = more trusted)
        pri = pc.cast(pc.utf8_slice_codeunits(batch.column("source"), 3, 99),
                      pa.int64())
        return batch.append_column("priority", pri)

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "text", "source"]).map_batches(
        augment, batch_format="pyarrow").map_batches(
        add_priority, batch_format="pyarrow")
    return exact_dedup_keep_best(ds, priority_column="priority")


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


def q_winnow_fingerprints(sf_dir: str):
    """Winnowing document fingerprints (Schleimer-Wilkerson-Aiken MOSS
    local fingerprinting, distinct-window-min variant): word-3-gram md5
    hashes, window-4 sliding minima, distinct per doc
    (stages/textops.WinnowFingerprinter — gram-hash memo is actor
    state, window math is one numpy sliding_window_view pass)."""
    from magic_content_extractor_ray.stages.textops import (
        winnow_fingerprints)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    return winnow_fingerprints(docs, concurrency=_pool())


def q_spearman(sf_dir: str):
    """Spearman rank correlation (tie-aware average ranks) between
    lineitem quantity and extended price — distributed WITHOUT a global
    sort: per-column value histograms → broadcast rank lookups → one
    integer sufficient-stats pass (stages/stats.spearman_corr)."""
    from magic_content_extractor_ray.stages.stats import spearman_corr

    ds = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_quantity", "l_extendedprice"])
    return spearman_corr(ds, col_a="l_quantity", col_b="l_extendedprice")


def q_table_profile(sf_dir: str):
    """Deequ/TFDV-style per-column data-quality profile over events
    (stages/profile.table_profile): completeness + EXACT cardinality —
    per-batch distinct partials, one O(distinct)-volume hash_agg per
    column, single combiner pass for the row/null counters."""
    from magic_content_extractor_ray.stages.profile import table_profile

    ds = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"])
    return table_profile(ds, ["user_id", "event_type", "props"])


def q_value_outliers(sf_dir: str):
    """Per-event-type z-score outlier screen (|v − mean| > 2σ_pop,
    stages/profile.grouped_value_outliers): exact centi-unit integer
    sufficient statistics combined map-side, tiny (group → cutoff)
    broadcast, map-side counting — bit-for-bit SQL-checkable because
    both engines derive mean/σ from identical integers."""
    from magic_content_extractor_ray.stages.profile import (
        grouped_value_outliers)

    ds = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["event_type", "value"])
    return grouped_value_outliers(ds, key_column="event_type",
                                  value_column="value")


def q_weekly_churn(sf_dir: str):
    """Week-over-week churn: for each ISO-epoch week w, how many of
    its active users returned in w+1 and how many churned. One
    O(users × weeks) distinct shuffle (packed user,week), then a
    per-user partition kernel marks week-pair transitions — the
    consecutive-week membership test that an OLTP anti-join would do
    per week-pair runs once over each user's sorted week set. Returns
    (week, active, retained, churned); the last observed week is
    excluded (its w+1 is unobservable)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        col_np, hash_agg, map_key_partitions)

    WEEK_US = 7 * 86400 * 1_000_000

    def distinct_partial(batch: pa.Table) -> pa.Table:
        week = pc.cast(pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                                 WEEK_US), pa.int64())
        g = pa.table({"user_id": batch.column("user_id"),
                      "week": week}).group_by(
            ["user_id", "week"]).aggregate([([], "count_all")])
        return g.drop_columns(["count_all"])

    # distinct (user, week) is bounded state (users × weeks); pin it so
    # the last-week probe and the transition pass share one shuffle
    uw = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        .map_batches(distinct_partial, batch_format="pyarrow"),
        "user_id", [("week", "max", "_m")],
        group_cols=["user_id", "week"]).drop_columns(["_m"]).materialize()

    # global last week (tiny aggregate): its w+1 is unobservable
    last_week = int(uw.max("week"))

    def transitions(t: pa.Table) -> pa.Table:
        # partition arrives user-major, weeks sorted + distinct per
        # user → "returned in w+1" is one shifted comparison
        uid = col_np(t, "user_id")
        wk = col_np(t, "week")
        n = len(uid)
        retained = np.zeros(n, dtype=np.int64)
        if n > 1:
            retained[:-1] = ((uid[1:] == uid[:-1])
                             & (wk[1:] == wk[:-1] + 1)).astype(np.int64)
        keep = wk < last_week
        return pa.table({
            "week": pa.array(wk[keep], pa.int64()),
            "active": pa.array(np.ones(int(keep.sum()), np.int64)),
            "retained": pa.array(retained[keep], pa.int64())})

    per_user = map_key_partitions(uw, "user_id", transitions,
                                  sort_cols=["week"])
    agg = hash_agg(per_user, "week",
                   [("active", "sum", "active"),
                    ("retained", "sum", "retained")])

    def finish(t: pa.Table) -> pa.Table:
        return t.append_column(
            "churned", pc.subtract(t.column("active"),
                                   t.column("retained")))

    return agg.map_batches(finish, batch_format="pyarrow").sort("week")


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


def q_concurrent_sessions(sf_dir: str):
    """Peak simultaneous sessions per day — the interval sweep-line
    (load planning: how many users are on at once?). Sessions are the
    30-min-gap intervals; each emits (+1 at start, −1 at end) deltas,
    tie-broken starts-before-ends so an interval is inclusive of its
    endpoints; the running count comes from the range-bucketed
    distributed prefix-sum (stages/scan.keyed_prefix_sum — no global
    sort), and the per-day max over start points (concurrency only
    rises at a start) is one tiny hash_agg. Ties among equal-time
    starts are scheduling-independent for the MAX (the last tied start
    sees all the others). SQL twin counts interval overlap at each
    start point directly."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import (
        col_np, hash_agg, map_key_partitions, segment_starts, ts_us)

    GAP_US = 1800 * 1_000_000

    def sessions(t: pa.Table) -> pa.Table:
        n = len(t)
        uid = col_np(t, "user_id")
        us = ts_us(t.column("ts"))
        ustarts = segment_starts(uid)
        is_start = np.zeros(n, dtype=bool)
        is_start[ustarts] = True
        is_start[1:] |= (us[1:] - us[:-1]) > GAP_US
        s_idx = np.nonzero(is_start)[0]
        e_idx = np.append(s_idx[1:], n) - 1
        # fix: a user's last session ends at the user's last event, and
        # a session never crosses into the next user's segment
        st, en = us[s_idx], us[e_idx]
        return pa.table({"st": pa.array(st, pa.int64()),
                         "en": pa.array(en, pa.int64())})

    sess = map_key_partitions(
        _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]),
        "user_id", sessions, sort_cols=["ts"])

    def deltas(t: pa.Table) -> pa.Table:
        st = t.column("st").to_numpy(zero_copy_only=False)
        en = t.column("en").to_numpy(zero_copy_only=False)
        return pa.table({
            "t": pa.array(np.concatenate([st, en]), pa.int64()),
            "d": pa.array(np.concatenate(
                [np.ones(len(st), np.int64),
                 -np.ones(len(en), np.int64)])),
            "tie": pa.array(np.concatenate(
                [-np.ones(len(st), np.int64),
                 np.ones(len(en), np.int64)])),
        })

    scanned = keyed_prefix_sum(
        sess.map_batches(deltas, batch_format="pyarrow"),
        key_column="t", value_column="d", tie_column="tie",
        bucket_width=3_600_000_000, out_column="run")

    def day_conc(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("d"), 0))
        conc = pc.add(t.column("run"), 1)
        day = pc.cast(pc.divide(t.column("t"), 86400000000), pa.int64())
        g = pa.table({"day_bucket": day, "conc": conc}).group_by(
            ["day_bucket"]).aggregate([("conc", "max")])
        return pa.table({"day_bucket": g.column("day_bucket"),
                         "max_concurrent": pc.cast(
                             g.column("conc_max"), pa.int64())})

    return hash_agg(
        scanned.map_batches(day_conc, batch_format="pyarrow"),
        "day_bucket", [("max_concurrent", "max", "max_concurrent")])


def q_dense_rank_docs(sf_dir: str):
    """DENSE_RANK window without a global sort: all docs whose n_chars
    is among their language's top-3 DISTINCT lengths (ties keep every
    member — the RANK-family semantics row_number/top-k can't express).
    Distributed as: distinct (lang, n_chars) via one O(distinct)
    hash_agg, per-lang top-3 values reduced driver-side (|langs|×3),
    broadcast as a threshold+rank lookup into a shuffle-free filter.
    Returns (doc_id, lang, n_chars, dr)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from magic_content_extractor_ray.stages.window import hash_agg

    def distinct_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "n_chars"]).aggregate(
            [([], "count_all")])
        return g.drop_columns(["count_all"])

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang", "n_chars"])
    distinct = hash_agg(
        docs.select_columns(["lang", "n_chars"]).map_batches(
            distinct_partial, batch_format="pyarrow"),
        "lang", [("n_chars", "max", "_m")],
        group_cols=["lang", "n_chars"]).drop_columns(["_m"])
    cands = distinct.map_batches(
        lambda b: _batch_topk(b, [("n_chars", "descending")], k=3,
                              group="lang"),
        batch_format="pyarrow", batch_size=8192).take_all()

    top: dict = {}
    for r in cands:
        top.setdefault(r["lang"], []).append(int(r["n_chars"]))
    # rank lookup: lang → its top-3 distinct lengths, descending
    top = {k: sorted(v, reverse=True)[:3] for k, v in top.items()}
    lut = ray.put(top)

    def flag(batch: pa.Table) -> pa.Table:
        table = ray.get(lut)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        nc = batch.column("n_chars").to_numpy(zero_copy_only=False)
        dr = np.zeros(len(nc), dtype=np.int64)
        for lang in np.unique(langs):
            vals = table.get(lang, [])
            sel = langs == lang
            ranks = np.zeros(int(sel.sum()), dtype=np.int64)
            sub = nc[sel]
            for i, v in enumerate(vals, start=1):
                ranks[sub == v] = i
            dr[sel] = ranks
        out = batch.append_column("dr", pa.array(dr, pa.int64()))
        return out.filter(pc.greater(out.column("dr"), 0))

    return docs.map_batches(flag, batch_format="pyarrow")


def q_title_fuzzy(sf_dir: str):
    """Fuzzy title self-join: all pairs of distinct 12-char document
    prefixes at Levenshtein distance exactly 1
    (stages/fuzzy.edit1_join) — SymSpell deletion-neighborhood
    bucketing (complete, unlike LSH: distance ≤ 1 ⟹ a shared deletion
    variant), exact O(L) verify, pair dedup via hash_agg. The DuckDB
    oracle is a fully INDEPENDENT brute-force levenshtein cross join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.fuzzy import edit1_join

    def titles(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(pc.utf8_slice_codeunits(
            batch.column("text"), 0, 12))
        return pa.table({"title": t.filter(pc.not_equal(t, ""))})

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["text"]).map_batches(
        titles, batch_format="pyarrow")
    return edit1_join(ds, "title")


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


def q_segment_gini(sf_dir: str):
    """Revenue-concentration audit: per market segment, the EXACT Gini
    coefficient of per-customer total spend (is one whale segment
    carrying the revenue?). Pipeline: per-customer cent totals (one
    O(customers) hash_agg), a partitioned hash_join to attach the
    segment, then a (segment, spend → count) histogram shuffle whose
    per-segment finisher evaluates Σ rank·xᵢ WITHOUT materializing
    ranks — for each histogram cell (v, c) after ``cum`` cheaper
    customers, Σ ranks = c·cum + c(c+1)/2, so
    G = (2·Σ i·xᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ) comes out of exact integers
    (state O(distinct spend values per segment), the
    grouped_quantiles bound). SQL twin mirrors the double casts."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import hash_agg

    def spend_partial(batch: pa.Table) -> pa.Table:
        cents = pa.array(np.round(batch.column("o_totalprice").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64), pa.int64())
        g = pa.table({"o_custkey": batch.column("o_custkey"),
                      "v": cents}).group_by(["o_custkey"]).aggregate(
            [("v", "sum")])
        return pa.table({"o_custkey": g.column("o_custkey"),
                         "v": pc.cast(g.column("v_sum"), pa.int64())})

    spend = hash_agg(
        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_totalprice"])
        .map_batches(spend_partial, batch_format="pyarrow"),
        "o_custkey", [("v", "sum", "v")])

    cust = _read_pq(f"{sf_dir}/customer.parquet",
                    columns=["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table({"o_custkey": t.column("c_custkey"),
                            "segment": t.column("c_mktsegment")}),
        batch_format="pyarrow")

    joined = hash_join(
        spend, cust, key="o_custkey", left_cols=["v"],
        right_cols=["segment"],
        left_types={"o_custkey": pa.int64(), "v": pa.int64()},
        right_types={"o_custkey": pa.int64(), "segment": pa.string()})

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["segment", "v"]).aggregate([([], "count_all")])
        return pa.table({"segment": g.column("segment"),
                         "v": g.column("v"),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    hist = hash_agg(joined.map_batches(hist_partial, batch_format="pyarrow"),
                    "segment", [("c", "sum", "c")],
                    group_cols=["segment", "v"])

    def finish(df):
        import pandas as pd

        df = df.sort_values("v").reset_index(drop=True)
        v = df["v"].to_numpy(dtype=object)        # exact python ints
        c = df["c"].to_numpy(dtype=object)
        n = s0 = s1 = 0
        for vi, ci in zip(v, c):
            vi, ci = int(vi), int(ci)
            s1 += vi * (ci * n + ci * (ci + 1) // 2)   # Σ rank·x over cell
            s0 += vi * ci
            n += ci
        gini = float(2 * s1 - (n + 1) * s0) / float(n * s0)
        gini = float(np.floor(gini * 1e6 + 0.5) / 1e6)
        return pd.DataFrame({"segment": [df["segment"].iloc[0]],
                             "n": np.array([n], np.int64),
                             "gini": [gini]})

    return hist.groupby("segment").map_groups(finish, batch_format="pandas")


def q_cumulative_users(sf_dir: str):
    """Daily new + cumulative distinct users — the running-DISTINCT
    window (audience-growth curve) that a naive count(DISTINCT) OVER
    would re-scan per day. Distributed as: per-user first-seen day
    (one O(users) min-shuffle via hash_agg), a tiny per-day count, and
    a driver-side cumsum over the bounded day range. Exact integers
    throughout."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor(pc.divide(
            pc.cast(batch.column("ts"), pa.int64()), 86400000000)),
            pa.int64())
        g = pa.table({"user_id": batch.column("user_id"),
                      "day": day}).group_by(["user_id"]).aggregate(
            [("day", "min")])
        return pa.table({"user_id": g.column("user_id"),
                         "first_day": g.column("day_min")})

    first = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pyarrow"),
        "user_id", [("first_day", "min", "first_day")])

    def day_counts(t: pa.Table) -> pa.Table:
        g = t.group_by(["first_day"]).aggregate([([], "count_all")])
        return pa.table({"day_bucket": g.column("first_day"),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    rows = hash_agg(first.map_batches(day_counts, batch_format="pyarrow"),
                    "day_bucket", [("c", "sum", "c")]).take_all()
    rows.sort(key=lambda r: r["day_bucket"])
    cum = 0
    days, new, cums = [], [], []
    for r in rows:
        cum += int(r["c"])
        days.append(int(r["day_bucket"]))
        new.append(int(r["c"]))
        cums.append(cum)
    return pa.table({"day_bucket": pa.array(days, pa.int64()),
                     "new_users": pa.array(new, pa.int64()),
                     "cum_users": pa.array(cums, pa.int64())})


def q_value_trend(sf_dir: str):
    """Per-event-type OLS value trend over time (is this metric
    drifting?): x = epoch day, y = centi-units, slope/intercept from
    exact integer sufficient statistics (stages/stats.grouped_linregress
    — one combiner-pass shuffle of (n, Σx, Σy, Σxx, Σxy) rows), the
    final floats mirrored CAST-for-CAST by the SQL twin."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.stats import grouped_linregress

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.drop_null()
        day = pc.cast(pc.cast(pc.cast(t.column("ts"), pa.date32()),
                              pa.int32()), pa.int64())
        cents = pa.array(np.round(t.column("value").to_numpy(
            zero_copy_only=False) * 100).astype(np.int64), pa.int64())
        return pa.table({"event_type": t.column("event_type"),
                         "day": day, "cents": cents})

    ds = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["event_type", "ts", "value"]).map_batches(
        prep, batch_format="pyarrow")
    return grouped_linregress(ds, key_column="event_type",
                              x_column="day", y_column="cents")


def q_source_drift_kl(sf_dir: str):
    """Dataset-composition drift: per-source KL divergence of the
    source's token distribution from the corpus-wide one, over the
    deterministic global top-200 vocabulary (count desc, term asc) —
    the screen a mixture-rebalancing / drift-detection pass runs before
    reweighting sources. Two bounded passes: (1) global term counts via
    hash_agg + tree top-k (no task holds the whole vocabulary),
    (2) per-(source, vocab-term) counts — the cell table is bounded by
    |sources|×200, so the KL math runs driver-side on exact integer
    counts. Each term's contribution p·ln(p/q) is rounded to integer
    nano-nats before summing (order-free), so the SQL twin hash-matches
    bit-for-bit; both p and q are normalized over the vocab terms."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import hash_agg

    K = 200

    def partial_counts(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        words = pc.list_flatten(_ws_split_lists(pc.utf8_lower(texts)))
        words = words.filter(pc.not_equal(words, ""))
        g = pa.table({"term": words}).group_by("term").aggregate(
            [("term", "count")])
        return pa.table({"term": g.column("term"),
                         "n": pc.cast(g.column("term_count"), pa.int64())})

    counts = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet", columns=["text"])
        .map_batches(partial_counts, batch_format="pyarrow"),
        "term", [("n", "sum", "n")])
    cands = counts.map_batches(
        lambda b: _batch_topk(b, [("n", "descending"),
                                  ("term", "ascending")], k=K),
        batch_format="pyarrow", batch_size=8192).take_all()
    cands.sort(key=lambda r: (-r["n"], r["term"]))
    vocab = {r["term"]: int(r["n"]) for r in cands[:K]}
    nv = sum(vocab.values())
    vocab_arr = pa.array(sorted(vocab), pa.string())

    def partial_cells(batch: pa.Table) -> pa.Table:
        texts = batch.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = _ws_split_lists(pc.utf8_lower(texts))
        words = pc.list_flatten(lists)
        src = batch.column("source").take(pc.list_parent_indices(lists))
        keep = pc.is_in(words, value_set=vocab_arr)
        g = pa.table({"term": words.filter(keep),
                      "source": src.filter(keep)}).group_by(
            ["term", "source"]).aggregate([([], "count_all")])
        return pa.table({"term": g.column("term"),
                         "source": g.column("source"),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["text", "source"]).map_batches(
        partial_cells, batch_format="pyarrow").groupby(
        ["term", "source"]).aggregate(Sum("c", alias_name="c")).take_all()

    nsv: dict = {}
    for r in cells:
        nsv[r["source"]] = nsv.get(r["source"], 0) + int(r["c"])
    kl_int: dict = {s: 0 for s in nsv}
    for r in cells:
        s, cst = r["source"], int(r["c"])
        x = (cst / nsv[s]) * float(np.log((cst * nv) /
                                          (nsv[s] * vocab[r["term"]])))
        kl_int[s] += int(np.sign(x) * np.floor(abs(x) * 1e9 + 0.5))
    out = sorted(nsv)
    return pa.table({
        "source": pa.array(out, pa.string()),
        "n": pa.array([nsv[s] for s in out], pa.int64()),
        "kl": pa.array([kl_int[s] / 1e9 for s in out], pa.float64()),
    })


def q_mad_outliers(sf_dir: str):
    """Per-event-type ROBUST outlier screen (|v − median| > 5·MAD,
    stages/profile.grouped_mad_outliers) — the 50%-breakdown companion
    to the z-score screen (one 1e9 reading inflates σ until nothing
    else trips; it cannot move the median). ONE histogram shuffle
    (state O(distinct values per group)); median, the folded deviation
    histogram, its median (MAD) and the outlier mass are all derived
    from that histogram in integers, so the counts are bit-for-bit
    SQL-checkable."""
    from magic_content_extractor_ray.stages.profile import (
        grouped_mad_outliers)

    ds = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["event_type", "value"])
    return grouped_mad_outliers(ds, key_column="event_type",
                                value_column="value")


def q_revenue_forecast(sf_dir: str):
    """TPC-H Q6 shape: single-pass filtered aggregate in EXACT integers
    — revenue forgone by a discount change. All three predicates run
    map-side on pruned columns (the discount test compares ROUNDED
    integer percent, not raw float, so Ray and SQL agree bit-for-bit);
    only one (sum, count) partial per batch crosses to the driver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import ts_us

    lo = int(np.datetime64("1996-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1997-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        ship = ts_us(batch.column("l_shipdate"))
        disc_pct = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), 100)), pa.int64())
        dp = disc_pct.to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        keep = ((ship >= lo) & (ship < hi) & (dp >= 5) & (dp <= 7)
                & (qty < 24))
        t = batch.filter(pa.array(keep))
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        dpk = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), 100)), pa.int64())
        rev = pc.sum(pc.multiply(price_c, dpk)).as_py() or 0
        return pa.table({"revenue_c4": pa.array([rev], pa.int64()),
                         "n_rows": pa.array([len(t)], pa.int64())})

    stats = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"],
    ).map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("revenue_c4", alias_name="revenue_c4"),
        Sum("n_rows", alias_name="n_rows"))
    import pandas as pd
    return pd.DataFrame({"revenue_c4": [int(stats["revenue_c4"])],
                         "n_rows": [int(stats["n_rows"])]})


def q_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: promo-part revenue share per ship-month. The
    part table is a BROADCAST bitmap (partkey -> is-promo via sorted
    searchsorted, `ray.put` once) — lineitem never shuffles; per-batch
    partials keyed by month, final share in exact integer parts-per-
    million via Python bigint cross-multiplication (no float division
    drift; the SQL twin uses HUGEINT the same way)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import ts_us

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    keys = part.column("p_partkey").to_numpy(zero_copy_only=False)
    promo = pc.equal(part.column("p_type"), "PROMO").to_numpy(
        zero_copy_only=False)
    order = np.argsort(keys)
    lookup_ref = ray.put({"keys": keys[order], "promo": promo[order]})

    class MonthPartial:
        def __init__(self):
            lk = ray.get(lookup_ref)
            self.keys, self.promo = lk["keys"], lk["promo"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            us = ts_us(batch.column("l_shipdate"))
            days = us // 86_400_000_000
            months = ((np.datetime64("1970-01-01")
                       + days.astype("timedelta64[D]")).astype(
                           "datetime64[M]").astype(np.int64))
            pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.keys, pk), 0,
                          max(len(self.keys) - 1, 0))
            is_promo = (self.keys[pos] == pk) & self.promo[pos]
            price_c = pc.cast(pc.round(pc.multiply(
                batch.column("l_extendedprice"), 100)), pa.int64())
            disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
                pa.scalar(1.0), batch.column("l_discount")), 100)),
                pa.int64())
            rev = pc.multiply(price_c, disc_pct).to_numpy(
                zero_copy_only=False)
            t = pa.table({
                "m": pa.array(months, pa.int64()),
                "promo_rev": pa.array(np.where(is_promo, rev, 0),
                                      pa.int64()),
                "total_rev": pa.array(rev, pa.int64()),
            })
            g = t.group_by("m").aggregate(
                [("promo_rev", "sum"), ("total_rev", "sum")])
            return pa.table({"m": g.column("m"),
                             "promo_rev": g.column("promo_rev_sum"),
                             "total_rev": g.column("total_rev_sum")})

    agg = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    ).map_batches(MonthPartial, batch_format="pyarrow",
                  concurrency=_pool()).groupby("m").aggregate(
        Sum("promo_rev", alias_name="promo_rev"),
        Sum("total_rev", alias_name="total_rev")).sort("m").take_all()

    import pandas as pd
    months = [np.datetime64(0, "M") + np.timedelta64(int(r["m"]), "M")
              for r in agg]
    return pd.DataFrame({
        "ship_month": [str(m) for m in months],
        "promo_rev_c4": [int(r["promo_rev"]) for r in agg],
        "total_rev_c4": [int(r["total_rev"]) for r in agg],
        # exact floor((1e6 * promo) / total) via Python bigints
        "promo_ppm": [(1_000_000 * int(r["promo_rev"]))
                      // int(r["total_rev"]) for r in agg],
    })


def q_customer_distribution(sf_dir: str):
    """TPC-H Q13 shape: how many customers placed exactly k orders
    (k = 0 included). Orders pre-aggregate per-batch to (custkey,
    partial count) — the only shuffle carries one row per distinct
    custkey per batch; zero-order customers come from the dimension
    count minus the distinct-buyer count (no outer join of the full
    customer table). Output: (c_count, custdist)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    n_customers = pq.read_metadata(
        f"{sf_dir}/customer.parquet").num_rows

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("o_custkey").aggregate([("o_custkey", "count")])
        return pa.table({
            "o_custkey": g.column("o_custkey"),
            "n": pc.cast(g.column("o_custkey_count"), pa.int64())})

    from magic_content_extractor_ray.stages.window import hash_agg

    # hash_agg: |customers| grows with sf — sort-aggregate would pay a
    # Python callback per customer (150k at sf1)
    per_cust = hash_agg(
        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        "o_custkey", [("n", "sum", "c_count")])

    dist = per_cust.groupby("c_count").aggregate(
        Count(alias_name="custdist")).take_all()
    rows = {int(r["c_count"]): int(r["custdist"]) for r in dist}
    buyers = sum(rows.values())
    if n_customers - buyers > 0:
        rows[0] = rows.get(0, 0) + (n_customers - buyers)

    import pandas as pd
    out = sorted(rows.items(), key=lambda kv: (-kv[1], -kv[0]))
    return pd.DataFrame({
        "c_count": [k for k, _ in out],
        "custdist": [v for _, v in out]})


def q_top_supplier(sf_dir: str):
    """TPC-H Q15 shape: the supplier(s) with MAX revenue over a quarter
    (ties all kept — the spec's correlated max). Revenue partials are
    keyed by suppkey map-side (supplier cardinality << rows), the max
    + tie filter runs on the driver over the supplier-sized aggregate,
    names attach from the broadcast-read dimension."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import ts_us

    lo = int(np.datetime64("1996-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1996-04-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        ship = ts_us(batch.column("l_shipdate"))
        t = batch.filter(pa.array((ship >= lo) & (ship < hi)))
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
            pa.scalar(1.0), t.column("l_discount")), 100)), pa.int64())
        g = pa.table({"l_suppkey": t.column("l_suppkey"),
                      "rev": pc.multiply(price_c, disc_pct)}).group_by(
            "l_suppkey").aggregate([("rev", "sum")])
        return pa.table({"l_suppkey": g.column("l_suppkey"),
                         "rev": g.column("rev_sum")})

    per_supp = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        "l_suppkey").aggregate(Sum("rev", alias_name="total_rev_c4")
                               ).take_all()

    best = max(int(r["total_rev_c4"]) for r in per_supp)
    winners = sorted(int(r["l_suppkey"]) for r in per_supp
                     if int(r["total_rev_c4"]) == best)
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"])
    names = dict(zip(supp.column("s_suppkey").to_pylist(),
                     supp.column("s_name").to_pylist()))
    import pandas as pd
    return pd.DataFrame({
        "s_suppkey": winners,
        "s_name": [names[k] for k in winners],
        "total_rev_c4": [best] * len(winners)})


def q_idle_customer_balance(sf_dir: str):
    """TPC-H Q22 shape (adapted to this schema: nation stands in for the
    phone country code, and "never ordered" becomes "dormant — no order
    since 2000-07-01" because every synthetic customer has SOME order):
    positive-balance customers RICHER than the global positive-balance
    average with no recent order, counted + summed per nation. The
    above-average test is an exact integer CROSS-MULTIPLY (bal_c * n >
    sum_c — no float threshold at the boundary); the dormancy test is a
    broadcast anti-filter over the distinct recent-buyer set (a bounded
    fraction of the dimension, shipped once via ray.put)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Count, Sum

    from magic_content_extractor_ray.stages.window import ts_us

    cut_us = int(np.datetime64("2000-07-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))

    # distinct recent buyers: per-batch filter + dedup, custkey-only shuffle
    def dedup(batch: pa.Table) -> pa.Table:
        keep = ts_us(batch.column("o_orderdate")) >= cut_us
        t = batch.filter(pa.array(keep))
        return pa.table({"o_custkey": pc.unique(t.column("o_custkey"))})

    from magic_content_extractor_ray.stages.window import hash_agg

    # hash_agg: |buyers| is customer-cardinality (sort-aggregate pays a
    # Python callback per customer at scale)
    buyers_rows = hash_agg(
        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_orderdate"]).map_batches(
            dedup, batch_format="pyarrow", batch_size=65536),
        "o_custkey", [("o_custkey", "count_all", "_n")]).take_all()
    buyers = np.sort(np.array(
        [int(r["o_custkey"]) for r in buyers_rows], dtype=np.int64))
    buyers_ref = ray.put(buyers)

    # global positive-balance mean, in exact cents
    def bal_partial(batch: pa.Table) -> pa.Table:
        bal_c = pc.cast(pc.round(pc.multiply(
            batch.column("c_acctbal"), 100)), pa.int64())
        pos = pc.filter(bal_c, pc.greater(bal_c, 0))
        return pa.table({
            "s": pa.array([pc.sum(pos).as_py() or 0], pa.int64()),
            "n": pa.array([len(pos)], pa.int64())})

    cust = f"{sf_dir}/customer.parquet"
    tot = _read_pq(cust, columns=["c_acctbal"]).map_batches(
        bal_partial, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    sum_c, n_pos = int(tot["s"]), int(tot["n"])

    class IdleRich:
        def __init__(self):
            self.buyers = ray.get(buyers_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bal_c = pc.cast(pc.round(pc.multiply(
                batch.column("c_acctbal"), 100)), pa.int64()).to_numpy(
                zero_copy_only=False)
            ck = batch.column("c_custkey").to_numpy(zero_copy_only=False)
            pos = np.clip(np.searchsorted(self.buyers, ck), 0,
                          max(len(self.buyers) - 1, 0))
            has_orders = (len(self.buyers) > 0) & (self.buyers[pos] == ck)
            keep = (~has_orders) & (bal_c * n_pos > sum_c)
            t = pa.table({
                "c_nationkey": pc.cast(batch.column("c_nationkey"),
                                       pa.int64()),
                "bal_c": pa.array(bal_c, pa.int64()),
            }).filter(pa.array(keep))
            g = t.group_by("c_nationkey").aggregate(
                [("bal_c", "sum"), ("bal_c", "count")])
            return pa.table({
                "c_nationkey": g.column("c_nationkey"),
                "total_bal_c": g.column("bal_c_sum"),
                "n_custs": pc.cast(g.column("bal_c_count"), pa.int64())})

    return _read_pq(cust, columns=["c_custkey", "c_acctbal",
                                   "c_nationkey"]).map_batches(
        IdleRich, batch_format="pyarrow", concurrency=_pool()).groupby(
        "c_nationkey").aggregate(
        Sum("total_bal_c", alias_name="total_bal_c"),
        Sum("n_custs", alias_name="n_custs")).sort("c_nationkey")


def q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape: bilateral EUROPE<->ASIA trade volume per
    (supp_nation, cust_nation, ship-year). BOTH nation attachments are
    broadcast lookups (supplier and customer are dimension-sized;
    `ray.put` once, searchsorted per batch) and both sides pre-filter
    to the two regions BEFORE the single orderkey hash_join — the
    shuffle carries only qualifying rows; the cross-region direction
    test runs post-join on a 25-entry nation->region array. Exact
    integer cents×pct revenue."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import ts_us

    lo = int(np.datetime64("1996-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1998-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rgrp = {int(r["r_regionkey"]): {"EUROPE": 0, "ASIA": 1}.get(
        r["r_name"], -1) for r in region.to_pylist()}
    name_of, grp_of = {}, {}
    for r in nation.to_pylist():
        name_of[int(r["n_nationkey"])] = r["n_name"]
        grp_of[int(r["n_nationkey"])] = rgrp[int(r["n_regionkey"])]
    nat_grp = np.full(max(grp_of) + 1, -1, np.int64)
    for k, g in grp_of.items():
        nat_grp[k] = g

    def _sorted_lookup(path, key_col, val_col):
        t = pq.read_table(path, columns=[key_col, val_col])
        k = t.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        o = np.argsort(k)
        return k[o], v[o]

    sk, sv = _sorted_lookup(f"{sf_dir}/supplier.parquet",
                            "s_suppkey", "s_nationkey")
    ck, cv = _sorted_lookup(f"{sf_dir}/customer.parquet",
                            "c_custkey", "c_nationkey")
    supp_ref, cust_ref = ray.put((sk, sv)), ray.put((ck, cv))

    def _attach(keys_ref, col, batch):
        ks, vs = ray.get(keys_ref)
        x = batch.column(col).to_numpy(zero_copy_only=False).astype(
            np.int64)
        pos = np.clip(np.searchsorted(ks, x), 0, max(len(ks) - 1, 0))
        nat = np.where(ks[pos] == x, vs[pos], -1)
        return nat

    class LineSide:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ship = ts_us(batch.column("l_shipdate"))
            nat = _attach(supp_ref, "l_suppkey", batch)
            in_grp = (nat >= 0) & (nat_grp[np.clip(nat, 0, None)] >= 0)
            keep = (ship >= lo) & (ship < hi) & in_grp
            t = batch.filter(pa.array(keep))
            years = ((ts_us(t.column("l_shipdate")) // 86_400_000_000)
                     .astype("timedelta64[D]")
                     + np.datetime64("1970-01-01")).astype(
                         "datetime64[Y]").astype(np.int64) + 1970
            price_c = pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100)), pa.int64())
            disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
                pa.scalar(1.0), t.column("l_discount")), 100)),
                pa.int64())
            return pa.table({
                "l_orderkey": t.column("l_orderkey"),
                "supp_nat": pa.array(nat[keep], pa.int64()),
                "l_year": pa.array(years, pa.int64()),
                "rev": pc.multiply(price_c, disc_pct)})

    class OrdSide:
        def __call__(self, batch: pa.Table) -> pa.Table:
            nat = _attach(cust_ref, "o_custkey", batch)
            keep = (nat >= 0) & (nat_grp[np.clip(nat, 0, None)] >= 0)
            t = batch.filter(pa.array(keep))
            return pa.table({
                "l_orderkey": t.column("o_orderkey"),
                "cust_nat": pa.array(nat[keep], pa.int64())})

    li = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_orderkey", "l_suppkey", "l_shipdate",
                           "l_extendedprice", "l_discount"]).map_batches(
        LineSide, batch_format="pyarrow", concurrency=_pool())
    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"]).map_batches(
        OrdSide, batch_format="pyarrow", concurrency=_pool())

    j = hash_join(
        li, orders, key="l_orderkey",
        left_cols=["supp_nat", "l_year", "rev"], right_cols=["cust_nat"],
        left_types={"l_orderkey": pa.int64(), "supp_nat": pa.int64(),
                    "l_year": pa.int64(), "rev": pa.int64()},
        right_types={"cust_nat": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        sg = nat_grp[t.column("supp_nat").to_numpy(zero_copy_only=False)]
        cg = nat_grp[t.column("cust_nat").to_numpy(zero_copy_only=False)]
        t = t.filter(pa.array(sg != cg))
        g = t.group_by(["supp_nat", "cust_nat", "l_year"]).aggregate(
            [("rev", "sum")])
        return pa.table({"supp_nat": g.column("supp_nat"),
                         "cust_nat": g.column("cust_nat"),
                         "l_year": g.column("l_year"),
                         "rev": g.column("rev_sum")})

    cells = j.map_batches(partial, batch_format="pyarrow").groupby(
        ["supp_nat", "cust_nat", "l_year"]).aggregate(
        Sum("rev", alias_name="revenue_c4")).take_all()

    import pandas as pd
    rows = sorted(((name_of[int(r["supp_nat"])],
                    name_of[int(r["cust_nat"])], int(r["l_year"]),
                    int(r["revenue_c4"])) for r in cells))
    return pd.DataFrame(rows, columns=["supp_nation", "cust_nation",
                                       "l_year", "revenue_c4"])


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape: NATION_3's market share (exact integer ppm) of
    PROMO-part revenue bought by EUROPE customers, per order-year.
    Three broadcast sides (part promo bitmap, supplier nation, customer
    in-Europe bitmap) prune both inputs map-side; one orderkey
    hash_join; the per-year share is a Python-bigint floor division
    mirrored by a HUGEINT twin (no float drift)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import ts_us

    lo = int(np.datetime64("1996-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1998-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    europe_rk = {int(r["r_regionkey"]) for r in region.to_pylist()
                 if r["r_name"] == "EUROPE"}
    europe_nations = {int(r["n_nationkey"]) for r in nation.to_pylist()
                      if int(r["n_regionkey"]) in europe_rk}
    n3 = next(int(r["n_nationkey"]) for r in nation.to_pylist()
              if r["n_name"] == "NATION_3")

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    promo = pc.equal(part.column("p_type"), "PROMO").to_numpy(
        zero_copy_only=False)
    o = np.argsort(pk)
    part_ref = ray.put((pk[o], promo[o]))

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False)
    sn = supp.column("s_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    o = np.argsort(sk)
    supp_ref = ray.put((sk[o], (sn == n3)[o]))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
    ce = np.isin(cust.column("c_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64),
        sorted(europe_nations))
    o = np.argsort(ck)
    cust_ref = ray.put((ck[o], ce[o]))

    def _flag(ref, col, batch):
        ks, fl = ray.get(ref)
        x = batch.column(col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, x), 0, max(len(ks) - 1, 0))
        return (ks[pos] == x) & fl[pos]

    class LineSide:
        def __call__(self, batch: pa.Table) -> pa.Table:
            keep = _flag(part_ref, "l_partkey", batch)
            is_n3 = _flag(supp_ref, "l_suppkey", batch)
            t = batch.filter(pa.array(keep))
            price_c = pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100)), pa.int64())
            disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
                pa.scalar(1.0), t.column("l_discount")), 100)),
                pa.int64())
            rev = pc.multiply(price_c, disc_pct).to_numpy(
                zero_copy_only=False)
            n3r = np.where(is_n3[keep], rev, 0)
            return pa.table({"l_orderkey": t.column("l_orderkey"),
                             "rev": pa.array(rev, pa.int64()),
                             "n3_rev": pa.array(n3r, pa.int64())})

    class OrdSide:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ts = ts_us(batch.column("o_orderdate"))
            keep = ((ts >= lo) & (ts < hi)
                    & _flag(cust_ref, "o_custkey", batch))
            t = batch.filter(pa.array(keep))
            years = ((ts_us(t.column("o_orderdate")) // 86_400_000_000)
                     .astype("timedelta64[D]")
                     + np.datetime64("1970-01-01")).astype(
                         "datetime64[Y]").astype(np.int64) + 1970
            return pa.table({"l_orderkey": t.column("o_orderkey"),
                             "o_year": pa.array(years, pa.int64())})

    li = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_orderkey", "l_partkey", "l_suppkey",
                           "l_extendedprice", "l_discount"]).map_batches(
        LineSide, batch_format="pyarrow", concurrency=_pool())
    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey",
                               "o_orderdate"]).map_batches(
        OrdSide, batch_format="pyarrow", concurrency=_pool())

    j = hash_join(
        li, orders, key="l_orderkey", left_cols=["rev", "n3_rev"],
        right_cols=["o_year"],
        left_types={"l_orderkey": pa.int64(), "rev": pa.int64(),
                    "n3_rev": pa.int64()},
        right_types={"o_year": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_year").aggregate(
            [("rev", "sum"), ("n3_rev", "sum")])
        return pa.table({"o_year": g.column("o_year"),
                         "rev": g.column("rev_sum"),
                         "n3_rev": g.column("n3_rev_sum")})

    cells = j.map_batches(partial, batch_format="pyarrow").groupby(
        "o_year").aggregate(Sum("rev", alias_name="total_rev_c4"),
                            Sum("n3_rev", alias_name="n3_rev_c4")
                            ).sort("o_year").take_all()

    import pandas as pd
    return pd.DataFrame({
        "o_year": [int(r["o_year"]) for r in cells],
        "n3_rev_c4": [int(r["n3_rev_c4"]) for r in cells],
        "total_rev_c4": [int(r["total_rev_c4"]) for r in cells],
        "mkt_share_ppm": [(1_000_000 * int(r["n3_rev_c4"]))
                          // int(r["total_rev_c4"]) for r in cells]})


def q_returned_items(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns
    (returnflag R) for orders placed in 1996H1. Both fact sides filter
    map-side before the single orderkey hash_join; per-batch custkey
    partials bound the aggregate shuffle; the top-20 cut has a full
    deterministic tiebreak and names attach from dimension reads on
    the driver (20 rows)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import ts_us

    lo = int(np.datetime64("1996-01-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))
    hi = int(np.datetime64("1996-07-01T00:00:00").astype(
        "datetime64[us]").astype(np.int64))

    def line_side(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
            pa.scalar(1.0), t.column("l_discount")), 100)), pa.int64())
        return pa.table({"l_orderkey": t.column("l_orderkey"),
                         "rev": pc.multiply(price_c, disc_pct)})

    def ord_side(batch: pa.Table) -> pa.Table:
        ts = ts_us(batch.column("o_orderdate"))
        t = batch.filter(pa.array((ts >= lo) & (ts < hi)))
        return pa.table({"l_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey")})

    li = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_orderkey", "l_returnflag",
                           "l_extendedprice", "l_discount"]).map_batches(
        line_side, batch_format="pyarrow")
    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey",
                               "o_orderdate"]).map_batches(
        ord_side, batch_format="pyarrow")

    j = hash_join(
        li, orders, key="l_orderkey", left_cols=["rev"],
        right_cols=["o_custkey"],
        left_types={"l_orderkey": pa.int64(), "rev": pa.int64()},
        right_types={"o_custkey": pa.int64()})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate([("rev", "sum")])
        return pa.table({"o_custkey": g.column("o_custkey"),
                         "rev": g.column("rev_sum")})

    from magic_content_extractor_ray.stages.window import hash_agg

    # hash_agg for the |customers|-cardinality aggregate (same rationale
    # as customer_distribution), then the deterministic top-20 cut
    top = hash_agg(
        j.map_batches(partial, batch_format="pyarrow",
                      batch_size=65536),
        "o_custkey", [("rev", "sum", "revenue_c4")]).sort(
        ["revenue_c4", "o_custkey"],
        descending=[True, False]).limit(20).take_all()

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey"])
    cmap = {int(k): (n, int(nk)) for k, n, nk in zip(
        cust.column("c_custkey").to_pylist(),
        cust.column("c_name").to_pylist(),
        cust.column("c_nationkey").to_pylist())}
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation.column("n_nationkey").to_pylist(),
                    nation.column("n_name").to_pylist()))

    import pandas as pd
    ck = [int(r["o_custkey"]) for r in top]
    return pd.DataFrame({
        "c_custkey": ck,
        "c_name": [cmap[k][0] for k in ck],
        "n_name": [nmap[cmap[k][1]] for k in ck],
        "revenue_c4": [int(r["revenue_c4"]) for r in top]})


def q_pareto_orders(sf_dir: str):
    """Distributed 2-D SKYLINE (stages/stats.pareto_front): orders not
    dominated on (totalprice, orderdate) — no other order is >= on both
    and > on one. Per-block local skylines reduce map-side (the global
    frontier is a subset of their union), one merge pass over the
    log-sized candidates. Exact integer cents/days; the SQL oracle is
    the independent NOT EXISTS dominance definition."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.stats import pareto_front
    from magic_content_extractor_ray.stages.window import ts_us

    def prep(batch: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        days = ts_us(batch.column("o_orderdate")) // 86_400_000_000
        return pa.table({"price_c": price_c,
                         "o_days": pa.array(days, pa.int64()),
                         "o_orderkey": batch.column("o_orderkey")})

    ds = _read_pq(f"{sf_dir}/orders.parquet",
                  columns=["o_orderkey", "o_totalprice",
                           "o_orderdate"]).map_batches(
        prep, batch_format="pyarrow")
    front = pareto_front(ds, x_column="price_c", y_column="o_days",
                         extra_columns=("o_orderkey",))
    return front.sort_by([("price_c", "descending"),
                          ("o_days", "ascending"),
                          ("o_orderkey", "ascending")])


def q_item_bfs(sf_dir: str):
    """Iterative distributed BFS (bounded-hop reachability) over the
    co-view item graph: edges = item pairs co-viewed by >= 2 users
    (support filter on the shared _covis_pair_counts pipeline, mirrored
    both directions), seed = smallest item id, 4 frontier-expansion
    rounds — each round is ONE semi hash_join (edges whose source is in
    the frontier) + ONE hash_agg min-dist merge, materialized so the
    lineage stays one round deep. This is the scale path for graphs
    whose frontier does not fit a broadcast; the SQL twin is an
    independent recursive CTE."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Min

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import hash_agg

    MAX_HOPS, MIN_SUPPORT = 4, 2

    counts = _covis_pair_counts(sf_dir)

    def unpack_edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column("n_users"),
                                          MIN_SUPPORT))
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "item": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    edges = counts.map_batches(unpack_edges,
                               batch_format="pyarrow").materialize()

    # seed: smallest item id in the distinct (user, item) universe
    def items_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64())
        return pa.table({"item": pa.array(
            [pc.min(ks).as_py()] if len(t) else [], pa.int64())})

    seed = int(_read_pq(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    ).map_batches(items_only, batch_format="pyarrow").aggregate(
        Min("item", alias_name="m"))["m"])

    dist = ray.data.from_arrow(pa.table({
        "item": pa.array([seed], pa.int64()),
        "dist": pa.array([0], pa.int64())})).materialize()

    frontier = dist
    for h in range(1, MAX_HOPS + 1):
        # early exit once the frontier drains (count() on the small
        # materialized dist table, not a lineage re-execution)
        if frontier.count() == 0:
            break
        nbrs = hash_join(
            edges, frontier, key="item", left_cols=["dst"],
            right_cols=[], how="semi",
            left_types={"item": pa.int64(), "dst": pa.int64()},
            right_types={"dist": pa.int64()})

        def cand(batch: pa.Table, hop=h) -> pa.Table:
            return pa.table({
                "item": pc.unique(batch.column("dst")),
                "dist": pa.array(
                    [hop] * len(pc.unique(batch.column("dst"))),
                    pa.int64())})

        dist = hash_agg(
            dist.union(nbrs.map_batches(cand, batch_format="pyarrow")),
            "item", [("dist", "min", "dist")]).materialize()

        def this_hop(batch: pa.Table, hop=h) -> pa.Table:
            return batch.filter(pc.equal(batch.column("dist"), hop))

        frontier = dist.map_batches(this_hop, batch_format="pyarrow")

    return dist.sort("item")


def q_pricing_summary(sf_dir: str):
    """FULL TPC-H Q1 pricing summary (lineitem_pricing's superset):
    per (returnflag, linestatus) — sum qty / base price / discounted /
    charged, three averages, row count. Every sum is an EXACT integer
    (cents, cents×pct c4, cents×pct×pct c6) so partials merge
    order-free; averages divide the exact integers CAST-for-CAST like
    the SQL twin. One combiner shuffle of |flags×statuses| rows."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(
            batch.column("l_discount"), 100)), pa.int64())
        tax_pct = pc.cast(pc.round(pc.multiply(
            batch.column("l_tax"), 100)), pa.int64())
        disc_c4 = pc.multiply(price_c,
                              pc.subtract(pa.scalar(100), disc_pct))
        charge_c6 = pc.multiply(disc_c4,
                                pc.add(pa.scalar(100), tax_pct))
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": qty, "base_c": price_c, "disc_pct": disc_pct,
            "disc_c4": disc_c4, "charge_c6": charge_c6,
        })
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base_c", "sum"), ("disc_pct", "sum"),
             ("disc_c4", "sum"), ("charge_c6", "sum"), ("qty", "count")])
        return pa.table({
            "l_returnflag": g.column("l_returnflag"),
            "l_linestatus": g.column("l_linestatus"),
            "sum_qty": g.column("qty_sum"),
            "sum_base_c": g.column("base_c_sum"),
            "sum_disc_pct": g.column("disc_pct_sum"),
            "sum_disc_c4": g.column("disc_c4_sum"),
            "sum_charge_c6": g.column("charge_c6_sum"),
            "n_rows": pc.cast(g.column("qty_count"), pa.int64())})

    cells = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
    ).map_batches(partial, batch_format="pyarrow").groupby(
        ["l_returnflag", "l_linestatus"]).aggregate(
        *[Sum(c, alias_name=c) for c in
          ("sum_qty", "sum_base_c", "sum_disc_pct", "sum_disc_c4",
           "sum_charge_c6", "n_rows")]).sort(
        ["l_returnflag", "l_linestatus"]).take_all()

    import pandas as pd
    # averages: exact int / exact int, float()ed BEFORE dividing to
    # mirror the oracle's CAST(... AS DOUBLE) / CAST(... AS DOUBLE)
    return pd.DataFrame({
        "l_returnflag": [r["l_returnflag"] for r in cells],
        "l_linestatus": [r["l_linestatus"] for r in cells],
        "sum_qty": [int(r["sum_qty"]) for r in cells],
        "sum_base_c": [int(r["sum_base_c"]) for r in cells],
        "sum_disc_c4": [int(r["sum_disc_c4"]) for r in cells],
        "sum_charge_c6": [int(r["sum_charge_c6"]) for r in cells],
        "avg_qty": [float(int(r["sum_qty"])) / float(int(r["n_rows"]))
                    for r in cells],
        "avg_price_c": [float(int(r["sum_base_c"]))
                        / float(int(r["n_rows"])) for r in cells],
        "avg_disc_pct": [float(int(r["sum_disc_pct"]))
                         / float(int(r["n_rows"])) for r in cells],
        "n_rows": [int(r["n_rows"]) for r in cells]})


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


def q_weighted_median(sf_dir: str):
    """Per-returnflag WEIGHTED median price (weight = quantity) via
    stages/stats.grouped_weighted_median — the exact all-integer lower
    weighted median (smallest value whose 2·cumweight reaches the
    total), state O(distinct prices per flag), never raw rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.stats import (
        grouped_weighted_median)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "price_c": pc.cast(pc.round(pc.multiply(
                batch.column("l_extendedprice"), 100)), pa.int64()),
            "qty": pc.cast(batch.column("l_quantity"), pa.int64())})

    ds = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_returnflag", "l_extendedprice",
                           "l_quantity"]).map_batches(
        prep, batch_format="pyarrow")
    out = grouped_weighted_median(ds, key_column="l_returnflag",
                                  value_column="price_c",
                                  weight_column="qty")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"l_returnflag": t.column("l_returnflag"),
                         "wmedian_price_c": t.column("wmedian")})

    return out.map_batches(rename, batch_format="pyarrow").sort(
        "l_returnflag")


def q_conversion_lag(sf_dir: str):
    """View→purchase CONVERSION LAG percentiles: per user (hash
    partitions, users never straddle), events sorted by (ts, event_id),
    each purchase takes the running max of strictly-preceding view
    timestamps (vectorized cummax — no per-row loop), then the exact
    distributed value-histogram quantiles (quantile_cont interpolation)
    over the lag microseconds. The SQL twin is the identical
    ROWS-window max + quantile_cont."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.stats import grouped_quantiles
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, ts_us)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "ts_us": pa.array(ts_us(batch.column("ts")), pa.int64()),
            "event_id": pc.cast(batch.column("event_id"), pa.int64()),
            "is_view": pc.equal(batch.column("event_type"), "view"),
            "is_buy": pc.equal(batch.column("event_type"), "purchase")})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type"]
                  ).map_batches(prep, batch_format="pyarrow")

    def lags(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        iv = t.column("is_view").to_numpy(zero_copy_only=False)
        ib = t.column("is_buy").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "lag_us": pa.array([], pa.int64())})
        # rows arrive sorted by (user, ts, event_id); running max of
        # view ts, reset per user, shifted by one row (strict precede)
        import pandas as pd

        view_ts = np.where(iv, ts, np.int64(-1))
        grp_new = np.empty(n, bool)
        grp_new[0] = True
        grp_new[1:] = u[1:] != u[:-1]
        gid = np.cumsum(grp_new)
        # segmented cummax (C-speed; the arithmetic offset trick would
        # overflow int64 at group_count × epoch-us magnitudes)
        run = pd.Series(view_ts).groupby(gid).cummax().to_numpy()
        prev = np.concatenate(([np.int64(-1)], run[:-1]))
        prev = np.where(grp_new, np.int64(-1), prev)
        keep = ib & (prev >= 0)
        lag = ts[keep] - prev[keep]
        return pa.table({"k": pa.array(np.zeros(keep.sum(), np.int64),
                                       pa.int64()),
                         "lag_us": pa.array(lag, pa.int64())})

    lag_ds = map_key_partitions(ev, "user_id", lags,
                                sort_cols=["ts_us", "event_id"])
    return grouped_quantiles(lag_ds, key_column="k",
                             value_column="lag_us",
                             quantiles=(0.5, 0.95)).to_pandas().drop(
        columns=["k"]).rename(columns={"q_0_5": "p50_lag_us",
                                       "q_0_95": "p95_lag_us"})


def q_source_ks(sf_dir: str):
    """Per-source Kolmogorov–Smirnov drift statistic on the doc-length
    distribution vs the whole corpus — the CDF-based companion to
    source_drift_kl. ONE (source, n_chars) histogram shuffle; the
    corpus CDF (O(distinct lengths)) is assembled once and broadcast
    into each source's partition, where the sup-distance is an exact
    INTEGER max of |cs·ng − cg·ns| (per-source denominator is constant,
    so the argmax needs no floats); ks_ppm floors via Python bigints,
    HUGEINT in the twin."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["source", "n_chars"]).group_by(
            ["source", "n_chars"]).aggregate([("n_chars", "count")])
        return pa.table({
            "source": g.column("source"),
            "v": pc.cast(g.column("n_chars"), pa.int64()),
            "c": pc.cast(g.column("n_chars_count"), pa.int64())})

    hist = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["source", "n_chars"]).map_batches(
            partial, batch_format="pyarrow"),
        "source", [("c", "sum", "c")],
        group_cols=["source", "v"]).materialize()

    # corpus CDF over distinct values — through hash_agg (the distinct
    # value domain is data-scaled, not schema-constant)
    corpus = hash_agg(hist, "v", [("c", "sum", "c")]).sort(
        "v").take_all()
    vals = np.array([int(r["v"]) for r in corpus], np.int64)
    cg = np.cumsum(np.array([int(r["c"]) for r in corpus], np.int64))
    ng = int(cg[-1]) if len(cg) else 0
    cdf_ref = ray.put((vals, cg))

    def per_source(t: pa.Table) -> pa.Table:
        import pandas as pd

        vals_g, cg_g = ray.get(cdf_ref)
        df = t.to_pandas()
        out = {"source": [], "ns": [], "d_num": []}
        for s, g in df.groupby("source", sort=False):
            g = g.sort_values("v")
            v = g["v"].to_numpy(dtype="int64")
            cs = g["c"].to_numpy(dtype="int64").cumsum()
            ns = int(cs[-1])
            # evaluate at every corpus value point: cs(v) step lookup
            pos = np.searchsorted(v, vals_g, side="right") - 1
            cs_at = np.where(pos >= 0, cs[np.clip(pos, 0, None)], 0)
            d = np.abs(cs_at * ng - cg_g * ns)
            out["source"].append(s)
            out["ns"].append(ns)
            out["d_num"].append(int(d.max()) if len(d) else 0)
        return pa.Table.from_pandas(pd.DataFrame(out),
                                    preserve_index=False)

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions)

    rows = map_key_partitions(hist, "source", per_source).take_all()
    import pandas as pd
    rows = sorted(rows, key=lambda r: r["source"])
    return pd.DataFrame({
        "source": [r["source"] for r in rows],
        "n_docs": [int(r["ns"]) for r in rows],
        "ks_ppm": [(1_000_000 * int(r["d_num"]))
                   // (int(r["ns"]) * ng) for r in rows]})


def q_event_transitions(sf_dir: str):
    """First-order MARKOV transition counts over per-user event-type
    sequences (sequence mining / next-event modeling): users never
    straddle partitions, rows arrive (ts, event_id)-sorted, the bigram
    pairs are one vectorized shift + boundary mask per partition,
    partial (prev, next) counts combine in a |types|² shuffle. The SQL
    twin is the identical LEAD window."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, ts_us)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "ts_us": pa.array(ts_us(batch.column("ts")), pa.int64()),
            "event_id": pc.cast(batch.column("event_id"), pa.int64()),
            "event_type": batch.column("event_type")})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type"]
                  ).map_batches(prep, batch_format="pyarrow")

    def bigrams(t: pa.Table) -> pa.Table:
        n = len(t)
        if n < 2:
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        same_user = u[1:] == u[:-1]
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        mask = pa.array(same_user)
        pairs = pa.table({"prev_type": et.slice(0, n - 1).filter(mask),
                          "next_type": et.slice(1, n - 1).filter(mask)})
        g = pairs.group_by(["prev_type", "next_type"]).aggregate(
            [([], "count_all")])
        return pa.table({"prev_type": g.column("prev_type"),
                         "next_type": g.column("next_type"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    return map_key_partitions(
        ev, "user_id", bigrams, sort_cols=["ts_us", "event_id"]).groupby(
        ["prev_type", "next_type"]).aggregate(
        Sum("n", alias_name="n")).sort(["prev_type", "next_type"])


def q_rfm_segments(sf_dir: str):
    """RFM customer segmentation (recency / frequency / monetary):
    per-customer aggregates from one orders scan (custkey combiner),
    the three median cutpoints from ONE tagged value-histogram shuffle
    (tags r/f/m share the grouped_quantiles pass), then a broadcast
    bucketing pass counting customers per (r, f, m) octant. The SQL
    twin recomputes the identical quantile_cont cutpoints."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.stats import grouped_quantiles
    from magic_content_extractor_ray.stages.window import (
        hash_agg, ts_us)

    def partial(batch: pa.Table) -> pa.Table:
        days = ts_us(batch.column("o_orderdate")) // 86_400_000_000
        price_c = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "rd": pa.array(days, pa.int64()),
                      "m": price_c})
        g = t.group_by("o_custkey").aggregate(
            [("rd", "max"), ("m", "sum"), ("m", "count")])
        return pa.table({
            "o_custkey": g.column("o_custkey"),
            "rd": g.column("rd_max"),
            "f": pc.cast(g.column("m_count"), pa.int64()),
            "m": g.column("m_sum")})

    per_cust = hash_agg(
        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_orderdate", "o_totalprice"]
                 ).map_batches(partial, batch_format="pyarrow"),
        "o_custkey", [("rd", "max", "rd"), ("f", "sum", "f"),
                      ("m", "sum", "m")]).materialize()

    def tag(batch: pa.Table) -> pa.Table:
        out = []
        for name in ("rd", "f", "m"):
            out.append(pa.table({
                "tag": pa.array([name] * len(batch), pa.string()),
                "v": batch.column(name)}))
        return pa.concat_tables(out)

    cuts = grouped_quantiles(
        per_cust.map_batches(tag, batch_format="pyarrow"),
        key_column="tag", value_column="v",
        quantiles=(0.5,)).to_pandas().set_index("tag")["q_0_5"]
    cr, cf, cm = float(cuts["rd"]), float(cuts["f"]), float(cuts["m"])

    def bucket(batch: pa.Table) -> pa.Table:
        rd = batch.column("rd").to_numpy(zero_copy_only=False)
        f = batch.column("f").to_numpy(zero_copy_only=False)
        m = batch.column("m").to_numpy(zero_copy_only=False)
        t = pa.table({
            "r_b": pa.array(np.where(rd <= cr, 1, 2), pa.int64()),
            "f_b": pa.array(np.where(f <= cf, 1, 2), pa.int64()),
            "m_b": pa.array(np.where(m <= cm, 1, 2), pa.int64())})
        g = t.group_by(["r_b", "f_b", "m_b"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "r_b": g.column("r_b"), "f_b": g.column("f_b"),
            "m_b": g.column("m_b"),
            "n_customers": pc.cast(g.column("count_all"), pa.int64())})

    return per_cust.map_batches(bucket, batch_format="pyarrow").groupby(
        ["r_b", "f_b", "m_b"]).aggregate(
        Sum("n_customers", alias_name="n_customers")).sort(
        ["r_b", "f_b", "m_b"])


def q_classifier_auc(sf_dir: str):
    """EXACT distributed ROC-AUC (Mann–Whitney rank-sum with the
    standard tie correction) — the model-evaluation primitive for
    score/label columns at corpus scale, computed WITHOUT any global
    sort: one (score value, pos count, neg count) histogram shuffle
    (state O(distinct scores)), then U×2 accumulates in exact integers
    (2·negs_below·pos + negs_at·pos per value), so the SQL window twin
    matches bit-for-bit. Demo scoring: n_chars as a predictor of
    lang = 'en'. Output: counts and auc_ppm (exact bigint floor)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(batch: pa.Table) -> pa.Table:
        pos = pc.cast(pc.equal(batch.column("lang"), "en"), pa.int64())
        neg = pc.subtract(pa.scalar(1, pa.int64()), pos)
        t = pa.table({"v": pc.cast(batch.column("n_chars"), pa.int64()),
                      "pos": pos, "neg": neg})
        g = t.group_by("v").aggregate([("pos", "sum"), ("neg", "sum")])
        return pa.table({"v": g.column("v"),
                         "pos": g.column("pos_sum"),
                         "neg": g.column("neg_sum")})

    hist = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["lang", "n_chars"]).map_batches(
            partial, batch_format="pyarrow"),
        "v", [("pos", "sum", "pos"), ("neg", "sum", "neg")]).sort(
        "v").take_all()

    pos = np.array([int(r["pos"]) for r in hist], np.int64)
    neg = np.array([int(r["neg"]) for r in hist], np.int64)
    npos, nneg = int(pos.sum()), int(neg.sum())
    neg_below = np.concatenate(([0], np.cumsum(neg)[:-1]))
    u2 = int(np.sum(2 * neg_below * pos + neg * pos))

    import pandas as pd
    return pd.DataFrame({
        "n_pos": [npos], "n_neg": [nneg],
        # auc = u2 / (2*npos*nneg), floored to ppm in exact bigints
        "auc_ppm": [(1_000_000 * u2) // (2 * npos * nneg)]})


def q_dedup_overlap(sf_dir: str):
    """Asymmetric CONTAINMENT near-dup pairs: the overlap coefficient
    |A∩B| / min(|A|,|B|) over exact word-3-gram sets — catches the
    quote-expansion / subset duplicates Jaccard structurally misses (a
    short doc fully contained in a long one scores 1.0 here, near 0 on
    Jaccard). Same df-capped inverted-index machinery as dedup_ngram
    (stages/dedup.ngram_jaccard_dedup metric='overlap'), only the final
    vectorized score differs."""
    import pyarrow as pa

    from magic_content_extractor_ray.stages.dedup import (
        ngram_jaccard_dedup)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    out = ngram_jaccard_dedup(docs, threshold=0.8, max_df=32,
                              metric="overlap")

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"left_id": t.column("left_id"),
                         "right_id": t.column("right_id"),
                         "n_common": t.column("n_common"),
                         "overlap": t.column("jaccard")})

    return out.map_batches(rename, batch_format="pyarrow")


def q_benford_digits(sf_dir: str):
    """Benford's-law first-digit audit of order totals (fraud /
    synthetic-data screening): leading digit of the exact cents value
    via one vectorized string pass, a 9-row combiner shuffle, expected
    Benford counts and the chi-square statistic in half-up nano-units
    (libm log10 on both engines — the bm25 twin already pins that
    equivalence)."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        digit = pc.cast(pc.utf8_slice_codeunits(
            pc.cast(cents, pa.string()), 0, 1), pa.int64())
        t = pa.table({"digit": digit})
        g = t.group_by("digit").aggregate([([], "count_all")])
        return pa.table({"digit": g.column("digit"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/orders.parquet",
                     columns=["o_totalprice"]).map_batches(
        partial, batch_format="pyarrow").groupby("digit").aggregate(
        Sum("n", alias_name="n_orders")).sort("digit").take_all()

    import pandas as pd
    n_tot = sum(int(r["n_orders"]) for r in cells)
    out = {"digit": [], "n_orders": [], "expected": [], "chi2_term": []}
    for r in cells:
        d, n = int(r["digit"]), int(r["n_orders"])
        exp = n_tot * math.log10(1.0 + 1.0 / d)
        term = (n - exp) * (n - exp) / exp
        out["digit"].append(d)
        out["n_orders"].append(n)
        out["expected"].append(math.floor(exp * 1e6 + 0.5) / 1e6)
        out["chi2_term"].append(math.floor(term * 1e6 + 0.5) / 1e6)
    return pd.DataFrame(out)


def q_stickiness(sf_dir: str):
    """DAU/MAU STICKINESS per month (the standard audience-engagement
    ratio): distinct (user, day) via one packed-int64 combiner dedup,
    daily actives summed per month, distinct (user, month) the same
    way for monthly actives, ratio in exact integer ppm (avg daily
    actives × 1e6 // monthly actives, bigint floor — HUGEINT twin)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    from magic_content_extractor_ray.stages.window import hash_agg, ts_us

    def prep(batch: pa.Table) -> pa.Table:
        days = ts_us(batch.column("ts")) // 86_400_000_000
        months = ((np.datetime64("1970-01-01")
                   + days.astype("timedelta64[D]")).astype(
                       "datetime64[M]").astype(np.int64))
        u = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        t = pa.table({
            # pack (user, day): user ids fit 2^31 in this corpus family
            "ud": pa.array((u << np.int64(20)) | days, pa.int64()),
            "um": pa.array((u << np.int64(20)) | months, pa.int64()),
            "day": pa.array(days, pa.int64()),
            "month": pa.array(months, pa.int64())})
        return t

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts"]).map_batches(
        prep, batch_format="pyarrow").materialize()

    # distinct (user, day) -> per (month, day) actives -> per-month sums
    def dedup_ud(t: pa.Table) -> pa.Table:
        g = t.group_by("ud").aggregate([("day", "min"),
                                        ("month", "min")])
        return pa.table({"ud": g.column("ud"),
                         "day": g.column("day_min"),
                         "month": g.column("month_min")})

    uday = hash_agg(ev.select_columns(["ud", "day", "month"]).map_batches(
        dedup_ud, batch_format="pyarrow"),
        "ud", [("day", "min", "day"), ("month", "min", "month")])

    dau_cells = uday.groupby("month").aggregate(
        Count(alias_name="user_days")).take_all()

    def dedup_um(t: pa.Table) -> pa.Table:
        g = t.group_by("um").aggregate([("month", "min")])
        return pa.table({"um": g.column("um"),
                         "month": g.column("month_min")})

    mau_cells = hash_agg(
        ev.select_columns(["um", "month"]).map_batches(
            dedup_um, batch_format="pyarrow"),
        "um", [("month", "min", "month")]).groupby("month").aggregate(
        Count(alias_name="mau")).take_all()

    # days per month actually present in the data
    days_present: dict = {}
    for r in hash_agg(ev.select_columns(["day", "month"]).map_batches(
            lambda t: t.group_by(["day", "month"]).aggregate([]),
            batch_format="pyarrow"),
            "day", [("month", "min", "month")],
            group_cols=["day", "month"]).take_all():
        m = int(r["month"])
        days_present[m] = days_present.get(m, 0) + 1

    dau = {int(r["month"]): int(r["user_days"]) for r in dau_cells}
    mau = {int(r["month"]): int(r["mau"]) for r in mau_cells}

    import pandas as pd
    months = sorted(mau)
    return pd.DataFrame({
        "month": [str(np.datetime64(0, "M") + np.timedelta64(m, "M"))
                  for m in months],
        "user_days": [dau[m] for m in months],
        "n_days": [days_present[m] for m in months],
        "mau": [mau[m] for m in months],
        # avg DAU / MAU in exact ppm: user_days*1e6 // (n_days*mau)
        "stickiness_ppm": [
            (1_000_000 * dau[m]) // (days_present[m] * mau[m])
            for m in months]})


def q_revenue_autocorr(sf_dir: str):
    """LAG-1 AUTOCORRELATION of the daily-revenue series (time-series
    health diagnostic): daily exact-cent revenue from one combiner
    shuffle, consecutive-day pairs by a driver-side shift over the
    BOUNDED day series (O(days), not rows), Pearson over the pairs via
    exact integer sufficient statistics — the same
    float-the-exact-ints-then-divide shape as lineitem_corr, mirrored
    term-for-term by the twin."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import ts_us

    def partial(batch: pa.Table) -> pa.Table:
        days = ts_us(batch.column("o_orderdate")) // 86_400_000_000
        price_c = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        t = pa.table({"day": pa.array(days, pa.int64()),
                      "rev": price_c})
        g = t.group_by("day").aggregate([("rev", "sum")])
        return pa.table({"day": g.column("day"),
                         "rev": g.column("rev_sum")})

    cells = _read_pq(f"{sf_dir}/orders.parquet",
                     columns=["o_orderdate", "o_totalprice"]
                     ).map_batches(partial, batch_format="pyarrow"
                                   ).groupby("day").aggregate(
        Sum("rev", alias_name="rev")).sort("day").take_all()

    day = np.array([int(r["day"]) for r in cells], np.int64)
    rev = np.array([int(r["rev"]) for r in cells], np.int64)
    # pairs are CONSECUTIVE calendar days only (gaps break the chain)
    adj = (day[1:] - day[:-1]) == 1
    x = rev[:-1][adj].astype(object)  # python ints: Σxy exceeds int64
    y = rev[1:][adj].astype(object)
    n = len(x)
    sx, sy = int(sum(x)), int(sum(y))
    sxx = int(sum(a * a for a in x))
    syy = int(sum(a * a for a in y))
    sxy = int(sum(a * b for a, b in zip(x, y)))
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt((float(n) * float(sxx) - float(sx) * float(sx))
                    * (float(n) * float(syy) - float(sy) * float(sy)))
    import pandas as pd
    x6 = num / den
    return pd.DataFrame({"n_pairs": [n], "autocorr": [
        math.copysign(math.floor(abs(x6) * 1e6 + 0.5), x6) / 1e6]})


def q_lang_source_chi2(sf_dir: str):
    """CHI-SQUARE independence test on the lang × source contingency
    table (is language mix independent of source? — the global
    companion to lang_source_pmi's per-cell scores): one bounded
    |langs|×|sources| combiner shuffle, marginals and expected counts
    on the driver, per-cell chi2 terms in half-up micro-units summed
    in order-free integers. Exactly SQL-expressible."""
    import math

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["lang", "source"]).group_by(
            ["lang", "source"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["lang", "source"]).map_batches(
        partial, batch_format="pyarrow").groupby(
        ["lang", "source"]).aggregate(Sum("n", alias_name="n")
                                      ).take_all()

    rows = {(r["lang"], r["source"]): int(r["n"]) for r in cells}
    lang_tot: dict = {}
    src_tot: dict = {}
    for (lg, s), n in rows.items():
        lang_tot[lg] = lang_tot.get(lg, 0) + n
        src_tot[s] = src_tot.get(s, 0) + n
    n_tot = sum(lang_tot.values())

    chi2_int = 0
    for lg in lang_tot:
        for s in src_tot:
            obs = rows.get((lg, s), 0)
            exp = lang_tot[lg] * src_tot[s] / n_tot
            term = (obs - exp) * (obs - exp) / exp
            chi2_int += int(math.floor(term * 1e6 + 0.5))

    import pandas as pd
    return pd.DataFrame({
        "n_docs": [n_tot], "n_langs": [len(lang_tot)],
        "n_sources": [len(src_tot)],
        # df = (L-1)(S-1); chi2 as the exact sum of micro-unit terms
        "dof": [(len(lang_tot) - 1) * (len(src_tot) - 1)],
        "chi2": [chi2_int / 1e6]})


def q_media_thumbnails(sf_dir: str):
    """Image THUMBNAIL derivatives through REAL codecs both directions
    (stages/multimodal.thumbnail_pipeline): stdlib PNG decode →
    nearest-neighbor 16×16 resize → stdlib PNG re-encode in an actor
    pool; the re-encoded bytes' md5 rides the output (byte-exact proof
    of the write path) while raw thumb bytes stay out of the shuffle.
    Snapshot-oracled (codec output is not SQL-expressible); anchored by
    the PNG round-trip tests in test_training_ops/test_io."""
    from magic_content_extractor_ray.stages.multimodal import (
        thumbnail_pipeline)

    out = thumbnail_pipeline(_extracted(sf_dir), fake=False)
    return out.select_columns(
        ["media_ref", "kind", "thumb_px", "thumb_bytes", "thumb_md5",
         "thumb_mean"]).sort("media_ref")


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape (correlated aggregate subquery): revenue locked
    in orders whose quantity is below 20% of that PART's average
    quantity. Two passes over pruned lineitem columns: per-part (Σqty,
    n) combiner → the 0.2·avg thresholds broadcast as a sorted array →
    one vectorized filter + exact-cent sum. The float threshold is
    mirrored CAST-for-CAST (0.2 * (Σ/double(n)))."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def qty_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"pk": batch.column("l_partkey"),
                      "q": pc.cast(batch.column("l_quantity"),
                                   pa.int64())})
        g = t.group_by("pk").aggregate([("q", "sum"), ("q", "count")])
        return pa.table({"pk": g.column("pk"),
                         "sq": g.column("q_sum"),
                         "n": pc.cast(g.column("q_count"), pa.int64())})

    from magic_content_extractor_ray.stages.window import hash_agg

    # hash_agg, not groupby().aggregate(): |parts| grows with sf (20k at
    # sf1) and the 1024-row default partial barely compresses, so the
    # sort-aggregate was shuffling ~rows and paying a callback per part
    # (43 s at sf1 → ~6 s); 64k partial batches compress 3x up front
    per_part = hash_agg(
        _read_pq(f"{sf_dir}/lineitem.parquet",
                 columns=["l_partkey", "l_quantity"]).map_batches(
            qty_partial, batch_format="pyarrow", batch_size=65536),
        "pk", [("sq", "sum", "sq"), ("n", "sum", "n")]).take_all()

    pks = np.array([int(r["pk"]) for r in per_part], np.int64)
    # 0.2 * avg, with the oracle's exact double shape
    thr = np.array([0.2 * (float(int(r["sq"])) / float(int(r["n"])))
                    for r in per_part], np.float64)
    order = np.argsort(pks)
    thr_ref = ray.put((pks[order], thr[order]))

    def rev_partial(batch: pa.Table) -> pa.Table:
        ks, th = ray.get(thr_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, pk), 0, max(len(ks) - 1, 0))
        keep = (ks[pos] == pk) & (q < th[pos])
        t = batch.filter(pa.array(keep))
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        return pa.table({
            "rev_c": pa.array([pc.sum(price_c).as_py() or 0], pa.int64()),
            "n_rows": pa.array([len(t)], pa.int64())})

    tot = _read_pq(f"{sf_dir}/lineitem.parquet",
                   columns=["l_partkey", "l_quantity",
                            "l_extendedprice"]).map_batches(
        rev_partial, batch_format="pyarrow").aggregate(
        Sum("rev_c", alias_name="rev_c"),
        Sum("n_rows", alias_name="n_rows"))

    import pandas as pd
    return pd.DataFrame({
        "n_rows": [int(tot["n_rows"])],
        "revenue_c": [int(tot["rev_c"])],
        # Q17 reports avg yearly: sum/7.0 in doubles, 6dp half-away
        "avg_yearly_c": [__import__("math").floor(
            int(tot["rev_c"]) / 7.0 * 1e6 + 0.5) / 1e6]})


def q_brand_band_revenue(sf_dir: str):
    """TPC-H Q19 shape (disjunctive multi-band predicate, adapted to
    this schema's part attributes): discounted revenue from lineitems
    matching ANY of three (brand, size-range, quantity-band) arms. The
    part side compiles to THREE broadcast bitmap arms evaluated
    vectorized per batch (brand/size live on the broadcast part lookup,
    quantity on the fact row) — disjunctions never force a join."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"])
    pk = part.column("p_partkey").to_numpy(zero_copy_only=False)
    brand = np.asarray(part.column("p_brand").to_pylist(), dtype=object)
    size = part.column("p_size").to_numpy(zero_copy_only=False)
    order = np.argsort(pk)
    # arm part-side bitmaps: (brand, size range) per arm
    arm1 = (brand == "Brand#1") & (size >= 1) & (size <= 10)
    arm2 = (brand == "Brand#2") & (size >= 10) & (size <= 25)
    arm3 = (brand == "Brand#3") & (size >= 20) & (size <= 50)
    lookup_ref = ray.put((pk[order], arm1[order], arm2[order],
                          arm3[order]))

    def partial(batch: pa.Table) -> pa.Table:
        ks, a1, a2, a3 = ray.get(lookup_ref)
        x = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        q = batch.column("l_quantity").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(ks, x), 0, max(len(ks) - 1, 0))
        hit = ks[pos] == x
        keep = ((hit & a1[pos] & (q >= 1) & (q <= 11))
                | (hit & a2[pos] & (q >= 10) & (q <= 20))
                | (hit & a3[pos] & (q >= 20) & (q <= 30)))
        t = batch.filter(pa.array(keep))
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
            pa.scalar(1.0), t.column("l_discount")), 100)), pa.int64())
        rev = pc.sum(pc.multiply(price_c, disc_pct)).as_py() or 0
        return pa.table({"revenue_c4": pa.array([rev], pa.int64()),
                         "n_rows": pa.array([len(t)], pa.int64())})

    tot = _read_pq(f"{sf_dir}/lineitem.parquet",
                   columns=["l_partkey", "l_quantity", "l_extendedprice",
                            "l_discount"]).map_batches(
        partial, batch_format="pyarrow").aggregate(
        Sum("revenue_c4", alias_name="revenue_c4"),
        Sum("n_rows", alias_name="n_rows"))
    import pandas as pd
    return pd.DataFrame({"revenue_c4": [int(tot["revenue_c4"])],
                         "n_rows": [int(tot["n_rows"])]})


def q_item_neighbors(sf_dir: str):
    """Per-item "users also viewed" TOP-5 neighbor lists (the
    recommender-output shape of the co-occurrence family): the shared
    pair-count pipeline mirrored into both directions, then a per-item
    rank cut — per-batch Arrow top-k pruning bounds the candidates
    before one |items|-keyed partition rank (segment kernel, no
    per-group callback). Ties break (count desc, neighbor asc); the
    twin is the identical ROW_NUMBER window."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions)

    K = 5
    counts = _covis_pair_counts(sf_dir)

    def mirror(batch: pa.Table) -> pa.Table:
        pk = batch.column("pk").to_numpy(zero_copy_only=False)
        c = batch.column("n_users").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "item": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            "n_users": pa.array(np.concatenate([c, c]), pa.int64())})

    def prune(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_users", "descending"),
                                   ("nbr", "ascending")], k=K,
                           group="item")

    cands = counts.map_batches(mirror, batch_format="pyarrow"
                               ).map_batches(prune,
                                             batch_format="pyarrow")

    def rank_cut(t: pa.Table) -> pa.Table:
        it = t.column("item").to_numpy(zero_copy_only=False)
        nb = t.column("nbr").to_numpy(zero_copy_only=False)
        nu = t.column("n_users").to_numpy(zero_copy_only=False)
        order = np.lexsort((nb, -nu, it))
        it, nb, nu = it[order], nb[order], nu[order]
        new_grp = np.empty(len(it), bool)
        if len(it):
            new_grp[0] = True
            new_grp[1:] = it[1:] != it[:-1]
        starts = np.flatnonzero(new_grp)
        rank = np.arange(len(it)) - np.repeat(starts, np.diff(
            np.append(starts, len(it)))) + 1
        keep = rank <= K
        return pa.table({
            "item": pa.array(it[keep], pa.int64()),
            "rnk": pa.array(rank[keep], pa.int64()),
            "nbr": pa.array(nb[keep], pa.int64()),
            "n_users": pa.array(nu[keep], pa.int64())})

    return map_key_partitions(cands, "item", rank_cut).sort(
        ["item", "rnk"])


def q_session_bounds(sf_dir: str):
    """Session ENTRY→EXIT event-type matrix (landing/exit analysis):
    the 30-minute sessionization the user_sessions family pins, with
    deterministic (ts, event_id) order; per user partition the session
    boundaries are one vectorized gap pass, first/last types index out
    with no row loop, and the bounded |types|² matrix combines. The
    twin recomputes the identical window sessionization."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, ts_us)

    GAP_US = 1_800_000_000

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "ts_us": pa.array(ts_us(batch.column("ts")), pa.int64()),
            "event_id": pc.cast(batch.column("event_id"), pa.int64()),
            "event_type": batch.column("event_type")})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type"]
                  ).map_batches(prep, batch_format="pyarrow")

    def bounds(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return pa.table({"entry_type": pa.array([], pa.string()),
                             "exit_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts_us").to_numpy(zero_copy_only=False)
        new_sess = np.empty(n, bool)
        new_sess[0] = True
        new_sess[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > GAP_US)
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        pairs = pa.table({"entry_type": et.take(pa.array(starts)),
                          "exit_type": et.take(pa.array(ends))})
        g = pairs.group_by(["entry_type", "exit_type"]).aggregate(
            [([], "count_all")])
        return pa.table({"entry_type": g.column("entry_type"),
                         "exit_type": g.column("exit_type"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    return map_key_partitions(
        ev, "user_id", bounds, sort_cols=["ts_us", "event_id"]).groupby(
        ["entry_type", "exit_type"]).aggregate(
        Sum("n", alias_name="n_sessions")).sort(
        ["entry_type", "exit_type"])


def q_revenue_concentration(sf_dir: str):
    """Revenue CONCENTRATION: what share of total revenue the top-1%
    highest-spend customers capture (whale analysis). Per-customer
    exact-cent totals via hash_agg, the p99 spend cutpoint from the
    value-histogram quantile operator (quantile_cont, broadcast
    scalar), one conditional-sum pass — all shares in exact integer
    ppm via bigint floors (HUGEINT twin)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.stats import grouped_quantiles
    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"o_custkey": batch.column("o_custkey"),
                      "m": pc.cast(pc.round(pc.multiply(
                          batch.column("o_totalprice"), 100)),
                          pa.int64())})
        g = t.group_by("o_custkey").aggregate([("m", "sum")])
        return pa.table({"o_custkey": g.column("o_custkey"),
                         "m": g.column("m_sum")})

    per_cust = hash_agg(
        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_custkey", "o_totalprice"]).map_batches(
            partial, batch_format="pyarrow", batch_size=65536),
        "o_custkey", [("m", "sum", "m")]).materialize()

    cut = float(grouped_quantiles(
        per_cust.map_batches(
            lambda t: pa.table({"g": pa.array([1] * len(t), pa.int64()),
                                "m": t.column("m")}),
            batch_format="pyarrow"),
        key_column="g", value_column="m",
        quantiles=(0.99,)).to_pandas()["q_0_99"].iloc[0])

    def split(batch: pa.Table) -> pa.Table:
        m = batch.column("m")
        top = pc.greater(m, cut)
        t_sum = pc.sum(pc.if_else(top, m, pa.scalar(0, pa.int64())))
        return pa.table({
            "top_rev": pa.array([t_sum.as_py() or 0], pa.int64()),
            "all_rev": pa.array([pc.sum(m).as_py() or 0], pa.int64()),
            "top_n": pa.array([pc.sum(pc.cast(top, pa.int64())).as_py()
                               or 0], pa.int64()),
            "all_n": pa.array([len(batch)], pa.int64())})

    tot = per_cust.map_batches(split, batch_format="pyarrow").aggregate(
        *[Sum(c, alias_name=c) for c in
          ("top_rev", "all_rev", "top_n", "all_n")])

    import pandas as pd
    return pd.DataFrame({
        "top_customers": [int(tot["top_n"])],
        "all_customers": [int(tot["all_n"])],
        "top_share_ppm": [(1_000_000 * int(tot["top_rev"]))
                          // int(tot["all_rev"])]})


def q_item_components(sf_dir: str):
    """CONNECTED COMPONENTS of the co-view item graph (support >= 2
    edges, the same universe as item_bfs) through stages/graph's hybrid
    union-find / min-label-propagation — this gives the CC machinery a
    TRUE INDEPENDENT SQL oracle (a transitive-closure recursive CTE),
    where the dedup-clustering call sites can only pin it with
    snapshots and property tests. Output: (item, component) with
    component = min item id reachable; isolated items form their own
    singleton components."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from magic_content_extractor_ray.stages.graph import (
        connected_components)

    MIN_SUPPORT = 2
    counts = _covis_pair_counts(sf_dir)

    def unpack(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch.column("n_users"),
                                          MIN_SUPPORT))
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table({
            "left_id": pa.array(pk >> np.int64(31), pa.int64()),
            "right_id": pa.array(pk & np.int64((1 << 31) - 1),
                                 pa.int64())})

    comp = connected_components(
        counts.map_batches(unpack, batch_format="pyarrow"),
        node_col="item", label_col="component").materialize()

    # add singleton components for items with no qualifying edge (the
    # oracle's universe is ALL viewed items)
    def items_only(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64())
        return pa.table({"item": pc.unique(ks)})

    from magic_content_extractor_ray.stages.window import hash_agg

    all_items = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["event_type", "props"]).map_batches(
            items_only, batch_format="pyarrow"),
        "item", [("item", "count_all", "_n")])

    in_comp = np.sort(np.array(
        [int(r["item"]) for r in comp.take_all()], np.int64))
    in_ref = ray.put(in_comp)

    def singletons(batch: pa.Table) -> pa.Table:
        members = ray.get(in_ref)
        it = batch.column("item").to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(members, it), 0,
                      max(len(members) - 1, 0))
        miss = ~((len(members) > 0) & (members[pos] == it))
        return pa.table({"item": pa.array(it[miss], pa.int64()),
                         "component": pa.array(it[miss], pa.int64())})

    extra = all_items.map_batches(singletons, batch_format="pyarrow")
    return comp.union(extra).sort("item")


def q_audio_spectral(sf_dir: str):
    """REAL spectral audio features end-to-end: WAV payloads (stdlib
    codec) decode in the actor pool and run through numpy-rFFT spectral
    centroid / 85% rolloff / bandwidth (functions/audio.spectral_features
    — no DSP library). Snapshot-oracled; PHYSICALLY anchored by
    test_audio_spectral_tone_recovery: the fetch stub synthesizes pure
    tones at seeded frequencies, and the measured centroid recovers
    each tone's frequency."""
    import pyarrow as pa

    from magic_content_extractor_ray.stages.multimodal import (
        AudioSpectral, fetch_media_stub)

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        refs = [f"https://media.example/{i}/audio-0.wav"
                for i in ids.to_pylist()]
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(["audio"] * len(batch), pa.string()),
        })

    out = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
    ).map_batches(to_refs, batch_format="pyarrow").map_batches(
        fetch_media_stub, batch_format="pyarrow", batch_size=64,
    ).map_batches(AudioSpectral, batch_format="pyarrow", batch_size=64,
                  concurrency=_pool())

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "media_ref": t.column("media_ref"),
            "centroid_hz": pc.round(t.column("centroid_hz"), ndigits=3),
            "rolloff85_hz": pc.round(t.column("rolloff85_hz"),
                                     ndigits=3),
            "bandwidth_hz": pc.round(t.column("bandwidth_hz"),
                                     ndigits=3),
            "peak_hz": pc.round(t.column("peak_hz"), ndigits=3),
            "n_frames": pc.cast(t.column("n_frames"), pa.int64())})

    return out.map_batches(finish, batch_format="pyarrow").sort(
        "media_ref")


def q_image_phash(sf_dir: str):
    """PERCEPTUAL image hashing + exact-dup grouping — the image
    modality's dedup primitive (dHash: real PNG decode → grayscale →
    9×8 resize → 64 horizontal-gradient sign bits). One actor-pool
    decode pass, then a hash_agg group count per phash (identical
    images collapse; near-dups differ by a few Hamming bits and feed
    the same banding machinery simhash uses). Snapshot-oracled;
    anchored by the planted-duplicate/brightness-invariance unit
    test."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.multimodal import (
        ImagePHash, fetch_media_stub)
    from magic_content_extractor_ray.stages.window import hash_agg

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        refs = [f"https://media.example/{i % 200}/img-0.png"
                for i in ids.to_pylist()]  # %200 plants exact dups
        return pa.table({
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(["image"] * len(batch), pa.string()),
        })

    hashed = _read_pq(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
    ).map_batches(to_refs, batch_format="pyarrow").map_batches(
        fetch_media_stub, batch_format="pyarrow", batch_size=16,
    ).map_batches(ImagePHash, batch_format="pyarrow", batch_size=16,
                  concurrency=_pool(),
                  fn_constructor_kwargs={"fake": False})

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("phash").aggregate([([], "count_all")])
        return pa.table({"phash": g.column("phash"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    return hash_agg(
        hashed.map_batches(partial, batch_format="pyarrow"),
        "phash", [("n", "sum", "n_images")]).sort(
        ["phash"])


def q_rolling_active_users(sf_dir: str):
    """7-day ROLLING distinct active users per day (trailing-window
    distinct — the window no per-day groupby can express because one
    user spans many windows). Shuffle-lean exact plan: a user active on
    day a is counted on every day d in [a, a+6], so per user the covered
    days are a UNION OF INTERVALS [a_i, a_i+6]; runs of active days with
    gaps <= 6 merge into one interval, each interval contributes a +1/-1
    delta pair, and the per-day rolling-distinct count is the prefix sum
    of deltas. One distinct-(user,day) combiner pass, one per-user hash
    partition pass (numpy run detection), one tiny per-day delta
    aggregate (~2 rows per interval; bounded by the day span, never by
    row count)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, ts_us)

    W = 7  # trailing window size in days

    def prep(batch: pa.Table) -> pa.Table:
        days = ts_us(batch.column("ts")) // 86_400_000_000
        u = batch.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(u) and (u.min() < 0 or u.max() >= (1 << 42)):
            raise ValueError("user_id out of packable range")
        # pack (user, day) for the distinct combiner — day spans since
        # epoch fit comfortably in 20 bits through year 4840
        t = pa.table({"ud": pa.array((u << np.int64(20)) | days, pa.int64()),
                      "user_id": pa.array(u, pa.int64()),
                      "day": pa.array(days, pa.int64())})
        g = t.group_by("ud").aggregate([("user_id", "min"), ("day", "min")])
        return pa.table({"user_id": g.column("user_id_min"),
                         "day": g.column("day_min")})

    uday = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "ts"]).map_batches(
            prep, batch_format="pyarrow"),
        "user_id", [("day", "min", "day")],
        group_cols=["user_id", "day"]).materialize()

    def deltas(t: pa.Table) -> pa.Table:
        # t is sorted by (user_id, day); runs with day-gaps <= W-1 merge
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        d = t.column("day").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return pa.table({"day": pa.array([], pa.int64()),
                             "delta": pa.array([], pa.int64())})
        new_run = np.empty(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (u[1:] != u[:-1]) | (d[1:] - d[:-1] > W - 1)
        starts = np.nonzero(new_run)[0]
        ends = np.append(starts[1:], n) - 1  # last index of each run
        day_on = d[starts]            # interval opens (inclusive)
        day_off = d[ends] + W         # interval closes (exclusive)
        return pa.table({
            "day": pa.array(np.concatenate([day_on, day_off]), pa.int64()),
            "delta": pa.array(np.concatenate(
                [np.ones(len(starts), np.int64),
                 -np.ones(len(starts), np.int64)]), pa.int64())})

    cells = hash_agg(
        map_key_partitions(uday, "user_id", deltas, sort_cols=["day"]),
        "day", [("delta", "sum", "delta")]).take_all()

    # present days: report the rolling count only for days with activity
    present = sorted({int(r["day"]) for r in uday.select_columns(
        ["day"]).take_all()})
    cells.sort(key=lambda r: int(r["day"]))
    delta_days = np.array([int(r["day"]) for r in cells], np.int64)
    cum = np.cumsum(np.array([int(r["delta"]) for r in cells], np.int64))
    pos = np.searchsorted(delta_days, np.array(present, np.int64),
                          side="right") - 1
    return pd.DataFrame({"day": present,
                         "active_7d": [int(cum[p]) for p in pos]})


def q_dup_size_histogram(sf_dir: str):
    """Duplicate-CLUSTER-SIZE histogram (the corpus-health summary a
    dedup run is judged by: how much mass sits in what size of exact-dup
    group). Per-batch md5 fingerprint (reusing the exact-dedup content
    key), one hash_agg per fingerprint for group sizes, then a 9-ish-row
    combiner histogram over sizes — only (hash, count) rows ever
    shuffle."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def fingerprint(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5((t or "").encode()).hexdigest()
              for t in batch.column("text").to_pylist()]
        t = pa.table({"h": pa.array(hs, pa.string())})
        g = t.group_by("h").aggregate([([], "count_all")])
        return pa.table({"h": g.column("h"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    sizes = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["text"]).map_batches(
            fingerprint, batch_format="pyarrow"),
        "h", [("n", "sum", "sz")])

    def hist(t: pa.Table) -> pa.Table:
        g = t.group_by("sz").aggregate([([], "count_all"), ("sz", "sum")])
        return pa.table({
            "group_size": g.column("sz"),
            "n_groups": pc.cast(g.column("count_all"), pa.int64()),
            "n_docs": pc.cast(g.column("sz_sum"), pa.int64())})

    from ray.data.aggregate import Sum

    return sizes.map_batches(hist, batch_format="pyarrow").groupby(
        "group_size").aggregate(
        Sum("n_groups", alias_name="n_groups"),
        Sum("n_docs", alias_name="n_docs")).sort("group_size")


def q_fulfillment_lag(sf_dir: str):
    """Order-fulfillment lag percentiles per order priority: per-order
    lag = days from o_orderdate to the LAST lineitem shipment, then
    exact p50/p95 per priority from a (priority, lag) value histogram
    (integer day values — the histogram is O(distinct lags), never raw
    rows). Per-order max is a hash_agg (order-count-scale groups);
    priorities attach via the partitioned hash join."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.stats import grouped_quantiles
    from magic_content_extractor_ray.stages.window import hash_agg, ts_us

    def ship_days(batch: pa.Table) -> pa.Table:
        d = ts_us(batch.column("l_shipdate")) // 86_400_000_000
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "ship_day": pa.array(d, pa.int64())})

    last_ship = hash_agg(
        _read_pq(f"{sf_dir}/lineitem.parquet",
                 columns=["l_orderkey", "l_shipdate"]).map_batches(
            ship_days, batch_format="pyarrow"),
        "l_orderkey", [("ship_day", "max", "last_ship")])

    def order_days(batch: pa.Table) -> pa.Table:
        d = ts_us(batch.column("o_orderdate")) // 86_400_000_000
        return pa.table({"o_orderkey": batch.column("o_orderkey"),
                         "order_day": pa.array(d, pa.int64()),
                         "o_orderpriority": batch.column("o_orderpriority")})

    orders = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(order_days, batch_format="pyarrow").map_batches(
        lambda t: t.rename_columns(
            ["l_orderkey", "order_day", "o_orderpriority"]),
        batch_format="pyarrow")

    joined = hash_join(
        last_ship, orders, key="l_orderkey",
        left_cols=["last_ship"],
        right_cols=["order_day", "o_orderpriority"],
        left_types={"l_orderkey": pa.int64(), "last_ship": pa.int64()},
        right_types={"l_orderkey": pa.int64(), "order_day": pa.int64(),
                     "o_orderpriority": pa.string()})

    lags = joined.map_batches(
        lambda t: pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "lag_days": pc.subtract(t.column("last_ship"),
                                    t.column("order_day"))}),
        batch_format="pyarrow")

    out = grouped_quantiles(lags, key_column="o_orderpriority",
                            value_column="lag_days",
                            quantiles=(0.5, 0.95))
    return out.map_batches(
        lambda t: t.rename_columns(["o_orderpriority", "p50", "p95"]),
        batch_format="pyarrow").sort("o_orderpriority")


def q_priority_late_orders(sf_dir: str):
    """TPC-H Q4-shaped order-priority check (adapted to this corpus'
    columns: no commit/receipt dates, so 'late' = any lineitem shipped
    more than 60 days after the order date): orders placed in 1996Q3
    with at least one late lineitem, counted per priority. EXISTS is one
    inner hash join (date-filtered orders only — the fact side prunes
    before the exchange) + a per-order any() via hash_agg, then a
    5-row combiner count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import hash_agg, ts_us

    lo = np.datetime64("1996-07-01").astype("datetime64[D]").astype(
        np.int64)
    hi = np.datetime64("1996-10-01").astype("datetime64[D]").astype(
        np.int64)

    def orders_prep(batch: pa.Table) -> pa.Table:
        d = ts_us(batch.column("o_orderdate")) // 86_400_000_000
        mask = pa.array((d >= lo) & (d < hi))
        t = pa.table({"l_orderkey": batch.column("o_orderkey"),
                      "order_day": pa.array(d, pa.int64()),
                      "o_orderpriority": batch.column("o_orderpriority")})
        return t.filter(mask)

    orders = _read_pq(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_prep, batch_format="pyarrow")

    def ship_prep(batch: pa.Table) -> pa.Table:
        d = ts_us(batch.column("l_shipdate")) // 86_400_000_000
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "ship_day": pa.array(d, pa.int64())})

    ship = _read_pq(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_shipdate"]).map_batches(
        ship_prep, batch_format="pyarrow")

    joined = hash_join(
        ship, orders, key="l_orderkey",
        left_cols=["ship_day"],
        right_cols=["order_day", "o_orderpriority"],
        left_types={"l_orderkey": pa.int64(), "ship_day": pa.int64()},
        right_types={"l_orderkey": pa.int64(), "order_day": pa.int64(),
                     "o_orderpriority": pa.string()})

    late = joined.map_batches(
        lambda t: t.filter(pc.greater(
            pc.subtract(t.column("ship_day"), t.column("order_day")),
            60)).select(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow")

    per_order = hash_agg(late, "l_orderkey",
                         [("o_orderpriority", "min", "o_orderpriority")])

    def cnt(t: pa.Table) -> pa.Table:
        g = t.group_by("o_orderpriority").aggregate([([], "count_all")])
        return pa.table({
            "o_orderpriority": g.column("o_orderpriority"),
            "n_late_orders": pc.cast(g.column("count_all"), pa.int64())})

    from ray.data.aggregate import Sum

    return per_order.map_batches(cnt, batch_format="pyarrow").groupby(
        "o_orderpriority").aggregate(
        Sum("n_late_orders", alias_name="n_late_orders")).sort(
        "o_orderpriority")


def q_slow_suppliers(sf_dir: str):
    """TPC-H Q21-shaped 'suppliers who kept orders waiting' (adapted to
    this corpus' columns: no commit/receipt dates, so the lone LAST
    shipper of a multi-supplier order takes the blame): per
    (order, supplier) max ship day via hash_agg, one per-order hash
    partition pass that finds orders with >= 2 suppliers where exactly
    ONE supplier hit the order's latest ship day, a supplier-count
    aggregate, and a broadcast name attach (supplier is
    dimension-sized). Top 10 by wait count."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts,
        ts_us)

    def prep(batch: pa.Table) -> pa.Table:
        d = ts_us(batch.column("l_shipdate")) // 86_400_000_000
        return pa.table({"l_orderkey": batch.column("l_orderkey"),
                         "l_suppkey": batch.column("l_suppkey"),
                         "smax": pa.array(d, pa.int64())})

    per_os = hash_agg(
        _read_pq(f"{sf_dir}/lineitem.parquet",
                 columns=["l_orderkey", "l_suppkey", "l_shipdate"],
                 ).map_batches(prep, batch_format="pyarrow"),
        "l_orderkey", [("smax", "max", "smax")],
        group_cols=["l_orderkey", "l_suppkey"])

    def lone_last(t: pa.Table) -> pa.Table:
        # t sorted by l_orderkey; per order: >=2 suppliers and exactly
        # one supplier at the order max ship day
        o = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        s = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        m = t.column("smax").to_numpy(zero_copy_only=False)
        if not len(o):
            return pa.table({"l_suppkey": pa.array([], pa.int64())})
        starts = segment_starts(o)
        lens = segment_lengths(starts, len(o))
        omax = np.maximum.reduceat(m, starts)
        at_max = (m == np.repeat(omax, lens))
        n_at_max = np.add.reduceat(at_max, starts)
        pick = (lens >= 2) & (n_at_max == 1)
        # the lone supplier's row: at_max within a picked segment
        mask = at_max & np.repeat(pick, lens)
        return pa.table({"l_suppkey": pa.array(s[mask], pa.int64())})

    waits = hash_agg(
        map_key_partitions(per_os, "l_orderkey", lone_last).map_batches(
            lambda t: t.group_by("l_suppkey").aggregate(
                [([], "count_all")]).rename_columns(
                ["l_suppkey", "n"]),
            batch_format="pyarrow"),
        "l_suppkey", [("n", "sum", "numwait")])

    sup = _read_pq(f"{sf_dir}/supplier.parquet",
                   columns=["s_suppkey", "s_name"]).to_pandas()
    names_ref = ray.put(dict(zip(sup["s_suppkey"].astype(int),
                                 sup["s_name"])))

    def attach(t: pa.Table, *, _ref=names_ref) -> pa.Table:
        lk = ray.get(_ref)
        names = [lk[int(k)] for k in t.column("l_suppkey").to_pylist()]
        out = pa.table({"s_name": pa.array(names, pa.string()),
                        "numwait": pc.cast(t.column("numwait"),
                                           pa.int64())})
        return _batch_topk(out, [("numwait", "descending"),
                                 ("s_name", "ascending")], k=10)

    out = waits.map_batches(
        attach, batch_format="pyarrow").to_pandas().sort_values(
        ["numwait", "s_name"], ascending=[False, True]).head(
        10).reset_index(drop=True)
    return out[["s_name", "numwait"]]


def q_user_entropy(sf_dir: str):
    """Per-user Shannon entropy of the event-type mix (bot screening:
    near-zero entropy = single-action automation), top 20 by entropy.
    Exactly-mergeable plan: per (user, type) counts via hash_agg, then
    one per-user partition pass. Each c·ln(c) contribution is rounded
    to integer NANO-NATS before summing (order-independent — the same
    trick as the KL/PMI queries), so H = ln(n) − S/1e9/n is one
    deterministic float expression on both engines."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    def prep(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id", "event_type"]).aggregate(
            [([], "count_all")])
        import pyarrow.compute as pc

        return pa.table({"user_id": g.column("user_id"),
                         "event_type": g.column("event_type"),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    cells = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "event_type"]).map_batches(
            prep, batch_format="pyarrow"),
        "user_id", [("c", "sum", "c")],
        group_cols=["user_id", "event_type"])

    def per_user(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(u):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "entropy_nano": pa.array([], pa.int64())})
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        # integer nano-nat contributions FIRST, then integer sums.
        # ln via libm (math.log) over the few distinct counts — np.log's
        # SIMD path is not guaranteed last-bit-identical to DuckDB's libm
        uniq, inv = np.unique(c, return_inverse=True)
        logs = np.array([math.log(int(v)) for v in uniq], np.float64)
        contrib = np.floor(c * logs[inv] * 1e9 + 0.5).astype(np.int64)
        s = np.add.reduceat(contrib, starts).astype(np.int64)
        n = np.add.reduceat(c, starts).astype(np.int64)
        h = [int(math.floor((math.log(int(nn)) - int(ss) / 1e9 / int(nn))
                            * 1e9 + 0.5))
             for nn, ss in zip(n, s)]
        out = pa.table({"user_id": pa.array(u[starts], pa.int64()),
                        "n_events": pa.array(n, pa.int64()),
                        "entropy_nano": pa.array(h, pa.int64())})
        return _batch_topk(out.sort_by([
            ("entropy_nano", "descending"), ("user_id", "ascending")]),
            [("entropy_nano", "descending"), ("user_id", "ascending")],
            k=20)

    out = map_key_partitions(cells, "user_id", per_user,
                             sort_cols=["event_type"]).to_pandas()
    return out.sort_values(["entropy_nano", "user_id"],
                           ascending=[False, True]).head(
        20).reset_index(drop=True)[
        ["user_id", "n_events", "entropy_nano"]]


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


def q_embedding_covariance(sf_dir: str):
    """Full 64x64 covariance matrix of the embedding column (the input
    to whitening / PCA-style dimensionality audits), exact to the last
    bit: embeddings quantized to integer MICRO-units (round-half-away,
    matching SQL round()), per-batch integer sufficient stats
    (n, Σx 64-vector, ΣxxT Gram matrix via one int64 matmul), partials
    merged as arbitrary-precision Python ints on the driver (2 080
    cells × #batches rows — bounded by batch count, never by row
    count), cov = (n·Σxy − Σx·Σy)/n² single-rounded from the exact
    integer numerator exactly like CAST(... AS DOUBLE)/n²."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    DIM, SCALE = 64, 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"i": z, "j": z, "sxy": z, "sx": z,
                             "sy": z, "n": z})
        m = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64) * SCALE
        q = np.where(m >= 0, np.floor(m + 0.5),
                     np.ceil(m - 0.5)).astype(np.int64)
        gram = q.T @ q                     # 64x64 int64, exact
        sums = q.sum(axis=0)
        iu = np.triu_indices(DIM)
        return pa.table({
            "i": pa.array(iu[0].astype(np.int64), pa.int64()),
            "j": pa.array(iu[1].astype(np.int64), pa.int64()),
            "sxy": pa.array(gram[iu], pa.int64()),
            "sx": pa.array(sums[iu[0]], pa.int64()),
            "sy": pa.array(sums[iu[1]], pa.int64()),
            "n": pa.array(np.full(len(iu[0]), len(q), np.int64()),
                          pa.int64())})

    cells = _read_pq(f"{sf_dir}/embeddings.parquet",
                     columns=["embedding"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096).take_all()

    acc: dict[tuple[int, int], list] = {}
    for r in cells:
        k = (int(r["i"]), int(r["j"]))
        a = acc.setdefault(k, [0, 0, 0, 0])   # python ints: exact bignum
        a[0] += int(r["sxy"])
        a[1] += int(r["sx"])
        a[2] += int(r["sy"])
        a[3] += int(r["n"])
    out = {"i": [], "j": [], "cov_micro2": []}
    for (i, j), (sxy, sx, sy, n) in sorted(acc.items()):
        num = n * sxy - sx * sy            # exact integer numerator
        # single rounding, mirroring CAST(num AS DOUBLE)/CAST(n*n ..)
        out["i"].append(i)
        out["j"].append(j)
        out["cov_micro2"].append(float(num) / float(n * n))
    return pd.DataFrame(out)


def q_fk_violations(sf_dir: str):
    """Referential-integrity audit across the star schema (the data-
    quality gate a 100 TB ingest runs before anything else): orphan
    counts for each fact→dimension edge plus domain checks. Dimension-
    sized key sets (customer, part, supplier) are broadcast once via
    ray.put and probed with np.isin inside map_batches; the one
    fact→fact edge (lineitem→orders) is a partitioned anti hash join.
    Output is a constant-size checklist — nothing row-scale ever
    reaches the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.join import hash_join

    def keyset(table: str, col: str):
        arr = np.sort(_read_pq(f"{sf_dir}/{table}.parquet",
                               columns=[col]).to_pandas()[col].to_numpy(
            ).astype(np.int64))
        return ray.put(arr)

    cust_ref = keyset("customer", "c_custkey")
    part_ref = keyset("part", "p_partkey")
    supp_ref = keyset("supplier", "s_suppkey")

    def count_missing(ds, col: str, ref):
        def partial(batch: pa.Table, *, _ref=ref) -> pa.Table:
            keys = ray.get(_ref)
            vals = batch.column(col).to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(keys, vals)
            pos = np.clip(pos, 0, len(keys) - 1)
            miss = int((keys[pos] != vals).sum())
            return pa.table({"n": pa.array([miss], pa.int64())})

        from ray.data.aggregate import Sum

        rows = ds.map_batches(partial, batch_format="pyarrow").aggregate(
            Sum("n", alias_name="n"))
        return int(rows["n"] or 0)

    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderkey", "o_custkey"])
    lineitem = _read_pq(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity"])

    checks = {
        "orders_custkey_orphans": count_missing(
            orders.select_columns(["o_custkey"]), "o_custkey", cust_ref),
        "lineitem_partkey_orphans": count_missing(
            lineitem.select_columns(["l_partkey"]), "l_partkey", part_ref),
        "lineitem_suppkey_orphans": count_missing(
            lineitem.select_columns(["l_suppkey"]), "l_suppkey", supp_ref),
    }

    # fact→fact edge: anti join, both sides row-scale
    orphans = hash_join(
        lineitem.select_columns(["l_orderkey"]),
        orders.select_columns(["o_orderkey"]).map_batches(
            lambda t: t.rename_columns(["l_orderkey"]),
            batch_format="pyarrow"),
        key="l_orderkey", left_cols=[], right_cols=[], how="anti",
        left_types={"l_orderkey": pa.int64()},
        right_types={"l_orderkey": pa.int64()})
    checks["lineitem_orderkey_orphans"] = orphans.count()

    nonpos = lineitem.map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(pc.less_equal(
                t.column("l_quantity"), 0.0), pa.int64())).as_py() or 0)],
            pa.int64())}),
        batch_format="pyarrow")
    from ray.data.aggregate import Sum

    checks["lineitem_nonpositive_qty"] = int(
        nonpos.aggregate(Sum("n", alias_name="n"))["n"] or 0)

    empty_docs = _read_pq(f"{sf_dir}/documents.parquet",
                          columns=["text"]).map_batches(
        lambda t: pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(pc.or_kleene(
                pc.is_null(t.column("text")),
                pc.equal(pc.utf8_length(t.column("text")), 0)),
                pa.int64())).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow")
    checks["documents_empty_text"] = int(
        empty_docs.aggregate(Sum("n", alias_name="n"))["n"] or 0)

    items = sorted(checks.items())
    return pd.DataFrame({"check": [k for k, _ in items],
                         "n_violations": [int(v) for _, v in items]})


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


def q_truncation_twins(sf_dir: str):
    """Truncated-crawl detection: document groups sharing their first
    50 characters (the classic signature of the same page crawled to
    different depths / paywall cut-offs). One prefix hash_agg — only
    (prefix, count, min/max length) cells shuffle; groups of >= 2 with
    their length spread, largest groups first."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    P = 50

    def prep(batch: pa.Table) -> pa.Table:
        pre = pc.utf8_slice_codeunits(batch.column("text"), 0, P)
        t = pa.table({"prefix": pre, "n_chars": batch.column("n_chars")})
        g = t.group_by("prefix").aggregate(
            [([], "count_all"), ("n_chars", "min"), ("n_chars", "max")])
        return pa.table({
            "prefix": g.column("prefix"),
            "n_docs": pc.cast(g.column("count_all"), pa.int64()),
            "min_chars": pc.cast(g.column("n_chars_min"), pa.int64()),
            "max_chars": pc.cast(g.column("n_chars_max"), pa.int64())})

    groups = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["text", "n_chars"]).map_batches(
            prep, batch_format="pyarrow"),
        "prefix", [("n_docs", "sum", "n_docs"),
                   ("min_chars", "min", "min_chars"),
                   ("max_chars", "max", "max_chars")])

    out = groups.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("n_docs"), 2)),
        batch_format="pyarrow").to_pandas()
    out["len_spread"] = out["max_chars"] - out["min_chars"]
    out = out.sort_values(["n_docs", "prefix"],
                          ascending=[False, True]).reset_index(drop=True)
    return out[["prefix", "n_docs", "min_chars", "max_chars",
                "len_spread"]]


def q_last_touch_attribution(sf_dir: str):
    """LAST-TOUCH purchase attribution with a 24 h window: every
    purchase credits the item of the latest strictly-preceding click by
    the same user (ties on (ts, event_id) order — the conversion_lag
    convention), clicks older than 24 h attribute nothing. One per-user
    hash partition pass (pandas segmented forward-fill — C speed, no
    per-user callbacks), then a 20-row top-k over per-item counts."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, ts_us)

    HORIZON_US = 24 * 3600 * 1_000_000

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["click", "purchase"]))
        t = batch.filter(mask)
        items = pc.cast(pc.struct_field(pc.extract_regex(
            t.column("props"), r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64()) if t.num_rows else pa.array([], pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "ts_us": pa.array(ts_us(t.column("ts")), pa.int64()),
            "event_id": t.column("event_id"),
            "is_click": pc.equal(t.column("event_type"), "click"),
            "item": items})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type",
                           "props"]).map_batches(
        prep, batch_format="pyarrow")

    def attribute(t: pa.Table) -> pa.Table:
        df = t.to_pandas()  # partition-sized; segmented ffill is C-speed
        click_item = df["item"].where(df["is_click"])
        click_ts = df["ts_us"].where(df["is_click"])
        last_item = click_item.groupby(df["user_id"], sort=False).ffill()
        last_ts = click_ts.groupby(df["user_id"], sort=False).ffill()
        is_buy = ~df["is_click"].to_numpy()
        ok = (is_buy & last_ts.notna().to_numpy()
              & ((df["ts_us"] - last_ts) <= HORIZON_US).to_numpy())
        items = last_item[ok].astype("int64")
        vc = items.value_counts()
        return pa.table({
            "item": pa.array(vc.index.to_numpy(np.int64), pa.int64()),
            "n": pa.array(vc.to_numpy(np.int64), pa.int64())})

    counts = hash_agg(
        map_key_partitions(ev, "user_id", attribute,
                           sort_cols=["ts_us", "event_id"]),
        "item", [("n", "sum", "n_purchases")])

    out = counts.map_batches(
        lambda t: _batch_topk(t.sort_by([
            ("n_purchases", "descending"), ("item", "ascending")]),
            [("n_purchases", "descending"), ("item", "ascending")],
            k=20),
        batch_format="pyarrow").to_pandas()
    return out.sort_values(["n_purchases", "item"],
                           ascending=[False, True]).head(
        20).reset_index(drop=True)[["item", "n_purchases"]]


def q_upsert_orders(sf_dir: str):
    """Upsert / last-writer-wins MERGE (the SCD-1 ingest primitive):
    a deterministic update batch (every 7th order re-priced +10.00,
    version 2) merges into the base table (version 1); latest version
    per key wins via one hash_agg argmax — the winning version's price
    rides the same packed (version, cents) int64 cell, so no second
    join is needed. Output: per-status row count and exact revenue
    cents after the merge."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def tagged(batch: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        base = pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "o_orderstatus": batch.column("o_orderstatus"),
            "packed": pc.add(pc.multiply(pa.scalar(1, pa.int64()),
                                         pa.scalar(1 << 40, pa.int64())),
                             cents)})
        keys = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        upd = batch.filter(pa.array(keys % 7 == 0))
        upd_cents = pc.add(pc.cast(pc.round(pc.multiply(
            upd.column("o_totalprice"), 100)), pa.int64()), 1000)
        updates = pa.table({
            "o_orderkey": upd.column("o_orderkey"),
            "o_orderstatus": upd.column("o_orderstatus"),
            "packed": pc.add(pc.multiply(pa.scalar(2, pa.int64()),
                                         pa.scalar(1 << 40, pa.int64())),
                             upd_cents)})
        return pa.concat_tables([base, updates])

    merged = hash_agg(
        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_orderkey", "o_orderstatus",
                          "o_totalprice"]).map_batches(
            tagged, batch_format="pyarrow"),
        "o_orderkey", [("packed", "max", "packed"),
                       ("o_orderstatus", "min", "o_orderstatus")])

    def finish(t: pa.Table) -> pa.Table:
        cents = pc.bit_wise_and(t.column("packed"),
                                pa.scalar((1 << 40) - 1, pa.int64()))
        g = pa.table({"o_orderstatus": t.column("o_orderstatus"),
                      "cents": cents}).group_by(
            "o_orderstatus").aggregate(
            [([], "count_all"), ("cents", "sum")])
        return pa.table({
            "o_orderstatus": g.column("o_orderstatus"),
            "n_orders": pc.cast(g.column("count_all"), pa.int64()),
            "revenue_cents": pc.cast(g.column("cents_sum"), pa.int64())})

    from ray.data.aggregate import Sum

    return merged.map_batches(finish, batch_format="pyarrow").groupby(
        "o_orderstatus").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents")).sort(
        "o_orderstatus")


def _nation_region_lookup(sf_dir: str, region: str):
    """(region-membership bool array indexed by nationkey, name array)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rk = reg.filter(pc.equal(reg.column("r_name"), region)).column(
        "r_regionkey")[0].as_py()
    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    nkeys = nat.column("n_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    in_region = np.zeros(int(nkeys.max()) + 1, dtype=bool)
    in_region[nkeys[nat.column("n_regionkey").to_numpy(
        zero_copy_only=False).astype(np.int64) == rk]] = True
    names = np.array([""] * (int(nkeys.max()) + 1), dtype=object)
    names[nkeys] = nat.column("n_name").to_pylist()
    return in_region, names


def q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2 shape (min-cost supplier): for each SMALL part of size
    <= 15, the EUROPE supplier(s) offering the minimum supply cost,
    with ties kept (Q2 keeps every min-cost supplier). No partsupp
    table in this corpus, so the supply-cost relation is DERIVED from
    lineitem: cost(part, supplier) = min extendedprice cents observed.

    Plan: part filter + supplier→(nation, name, acctbal) are broadcast
    dimension lookups applied MAP-SIDE (rows for other parts/regions
    never enter the shuffle); one hash_agg per (part, supplier); the
    correlated min-cost subquery is one pass over per-part hash
    partitions (every (part, supplier) row of a part is co-located, so
    the min and the tie filter are exact locally)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    in_eur, nation_names = _nation_region_lookup(sf_dir, "EUROPE")
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_type",
                                  "p_size"])
    part = part.filter(pc.and_(pc.equal(part.column("p_type"), "SMALL"),
                               pc.less_equal(part.column("p_size"), 15)))
    pkeys = part.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    part_ok = np.zeros(int(pkeys.max()) + 2, dtype=bool)
    part_ok[pkeys] = True
    part_names = dict(zip(pkeys.tolist(), part.column("p_name").to_pylist()))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet")
    skeys = sup.column("s_suppkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    sup_nat = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    sup_nat[skeys] = sup.column("s_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    sup_names = dict(zip(skeys.tolist(), sup.column("s_name").to_pylist()))
    sup_bal = dict(zip(skeys.tolist(),
                       sup.column("s_acctbal").to_pylist()))
    part_ref = ray.put(part_ok)
    nat_ref = ray.put((sup_nat, in_eur))

    def prep(t: pa.Table) -> pa.Table:
        pok = ray.get(part_ref)
        sn, eur = ray.get(nat_ref)
        pk = t.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sk = t.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nk = np.where((sk >= 0) & (sk < len(sn)),
                      sn[np.clip(sk, 0, len(sn) - 1)], -1)
        keep = (pk < len(pok)) & pok[np.clip(pk, 0, len(pok) - 1)] & \
            (nk >= 0) & eur[np.clip(nk, 0, len(eur) - 1)]
        t = t.filter(pa.array(keep))
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "cost_c": pc.cast(pc.round(pc.multiply(
                t.column("l_extendedprice"), 100)), pa.int64()),
        })

    per_ps = hash_agg(
        _read_pq(f"{sf_dir}/lineitem.parquet",
                 columns=["l_partkey", "l_suppkey", "l_extendedprice"]
                 ).map_batches(prep, batch_format="pyarrow"),
        "l_partkey", [("cost_c", "min", "cost_c")],
        group_cols=["l_partkey", "l_suppkey"])

    def min_cost(t: pa.Table) -> pa.Table:
        # t sorted by l_partkey: keep rows at the per-part min (ties kept)
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        c = t.column("cost_c").to_numpy(zero_copy_only=False)
        if not len(p):
            return t
        starts = segment_starts(p)
        lens = segment_lengths(starts, len(p))
        pmin = np.minimum.reduceat(c, starts)
        return t.filter(pa.array(c == np.repeat(pmin, lens)))

    rows = map_key_partitions(per_ps, "l_partkey", min_cost).to_pandas()
    import pandas as pd

    rows["s_name"] = rows["l_suppkey"].map(sup_names)
    rows["s_acctbal"] = rows["l_suppkey"].map(sup_bal)
    rows["n_name"] = [nation_names[sup_nat[k]] for k in rows["l_suppkey"]]
    rows["p_name"] = rows["l_partkey"].map(part_names)
    out = rows.sort_values(
        ["s_acctbal", "n_name", "s_name", "l_partkey"],
        ascending=[False, True, True, True]).head(100).reset_index(
        drop=True)
    return out[["s_acctbal", "s_name", "n_name", "l_partkey", "p_name",
                "cost_c"]]


def q_product_profit(sf_dir: str):
    """TPC-H Q9 shape (product-type profit): profit per (supplier
    nation, order year) over parts named '.. gear', where profit =
    extendedprice*(1-discount) in exact integer cents×pct (no partsupp
    table, so the supply-cost term is out of scope — documented
    adaptation). part filter + supplier→nation are broadcast map-side
    prunes; lineitem⋈orders is the one partitioned big-big hash join;
    per-batch partials precede the bounded (25 nations × 7 years)
    final groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import ts_us

    _, nation_names = _nation_region_lookup(sf_dir, "EUROPE")
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    part = part.filter(pc.match_substring(part.column("p_name"), "gear"))
    pkeys = part.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    part_ok = np.zeros(int(pkeys.max()) + 2, dtype=bool)
    part_ok[pkeys] = True
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"])
    skeys = sup.column("s_suppkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    sup_nat = np.full(int(skeys.max()) + 1, -1, dtype=np.int64)
    sup_nat[skeys] = sup.column("s_nationkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    part_ref = ray.put(part_ok)
    sup_ref = ray.put(sup_nat)

    def li_side(t: pa.Table) -> pa.Table:
        pok = ray.get(part_ref)
        sn = ray.get(sup_ref)
        pk = t.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sk = t.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nk = np.where((sk >= 0) & (sk < len(sn)),
                      sn[np.clip(sk, 0, len(sn) - 1)], -1)
        keep = (pk < len(pok)) & pok[np.clip(pk, 0, len(pok) - 1)] & \
            (nk >= 0)
        t = t.filter(pa.array(keep))
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
            pa.scalar(1.0), t.column("l_discount")), 100)), pa.int64())
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "s_nat": pa.array(nk[keep], pa.int64()),
            "profit_c4": pc.multiply(price_c, disc_pct),
        })

    def ord_side(t: pa.Table) -> pa.Table:
        # exact calendar year via numpy datetime64 (no tz, us precision)
        years = t.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[Y]").astype(
            np.int64) + 1970
        return pa.table({
            "l_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "o_year": pa.array(years, pa.int64()),
        })

    i64 = pa.int64()
    li = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_orderkey", "l_partkey", "l_suppkey",
                           "l_extendedprice", "l_discount"]
                  ).map_batches(li_side, batch_format="pyarrow")
    ords = _read_pq(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_orderdate"]
                    ).map_batches(ord_side, batch_format="pyarrow")
    j = hash_join(li, ords, key="l_orderkey",
                  left_cols=["s_nat", "profit_c4"],
                  right_cols=["o_year"],
                  left_types={"l_orderkey": i64, "s_nat": i64,
                              "profit_c4": i64},
                  right_types={"l_orderkey": i64, "o_year": i64})

    name_ref = ray.put(nation_names)

    def finish(t: pa.Table) -> pa.Table:
        names = ray.get(name_ref)
        nk = t.column("s_nat").to_numpy(
            zero_copy_only=False).astype(np.int64)
        g = pa.table({
            "n_name": pa.array(names[nk].astype(str)),
            "o_year": t.column("o_year"),
            "profit_c4": t.column("profit_c4"),
        }).group_by(["n_name", "o_year"]).aggregate([("profit_c4", "sum")])
        return pa.table({"n_name": g.column("n_name"),
                         "o_year": g.column("o_year"),
                         "profit_c4": g.column("profit_c4_sum")})

    return j.map_batches(finish, batch_format="pyarrow").groupby(
        ["n_name", "o_year"]).aggregate(
        Sum("profit_c4", alias_name="profit_c4")).sort(
        ["n_name", "o_year"], descending=[False, True])


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape (important stock): parts whose revenue exceeds
    0.1% of TOTAL revenue. Per-part revenue via one hash_agg; the
    global total is the sum of the per-part rows (a second, tiny
    aggregate); the HAVING threshold (Q11's fraction = 0.0001) is the
    exact integer cross-multiply rev*10000 > total, rewritten as
    rev > total//10000 (equivalent for integer rev — avoids the int64
    overflow of the product form at corpus scale) and applied
    DISTRIBUTED with the floor-divided total as a broadcast scalar —
    only qualifying parts reach the driver."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_sum

    def prep(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(pc.subtract(
            pa.scalar(1.0), t.column("l_discount")), 100)), pa.int64())
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "rev": pc.multiply(price_c, disc_pct),
        })

    per_part = hash_sum(
        _read_pq(f"{sf_dir}/lineitem.parquet",
                 columns=["l_partkey", "l_extendedprice", "l_discount"]
                 ).map_batches(prep, batch_format="pyarrow"),
        "l_partkey", "rev", "value_c4").materialize()
    total = int(per_part.map_batches(
        lambda t: pa.table({"s": [pc.sum(t.column("value_c4")).as_py()
                                  or 0]}),
        batch_format="pyarrow").to_pandas()["s"].sum())

    def thresh(t: pa.Table, *, _floor=total // 10_000) -> pa.Table:
        keep = pc.greater(pc.cast(t.column("value_c4"), pa.int64()),
                          pa.scalar(_floor, pa.int64()))
        return t.filter(keep)

    import pandas as pd

    out = per_part.map_batches(
        thresh, batch_format="pyarrow").to_pandas()
    if out.empty:  # to_pandas() on an all-empty Dataset drops columns
        out = pd.DataFrame({"l_partkey": pd.Series(dtype="int64"),
                            "value_c4": pd.Series(dtype="int64")})
    out = out.sort_values(
        ["value_c4", "l_partkey"], ascending=[False, True]).reset_index(
        drop=True)
    out["value_c4"] = out["value_c4"].astype("int64")
    return out[["l_partkey", "value_c4"]]


def q_shipmode_priority(sf_dir: str):
    """TPC-H Q12 shape (late shipments by priority class): among
    lineitems shipped >= 60 days after the order date, per ship YEAR
    the count of high-priority (1-URGENT / 2-HIGH) vs lower-priority
    lines. No shipmode/commit/receipt columns in this corpus, so the
    'late' predicate is shipdate - orderdate >= 60 days (documented
    adaptation). lineitem⋈orders is the one partitioned hash join;
    the (year, is_high) group is bounded, so per-batch partials fold
    before a tiny final groupby."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import ts_us

    def li_side(t: pa.Table) -> pa.Table:
        sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "ship_day": pa.array(ts_us(t.column("l_shipdate"))
                                 // 86_400_000_000, pa.int64()),
            "ship_year": pa.array(sd.astype("datetime64[Y]").astype(
                np.int64) + 1970, pa.int64()),
        })

    def ord_side(t: pa.Table) -> pa.Table:
        hi = pc.is_in(t.column("o_orderpriority"),
                      value_set=pa.array(["1-URGENT", "2-HIGH"]))
        return pa.table({
            "l_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "order_day": pa.array(ts_us(t.column("o_orderdate"))
                                  // 86_400_000_000, pa.int64()),
            "is_high": pc.cast(hi, pa.int64()),
        })

    i64 = pa.int64()
    li = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_orderkey", "l_shipdate"]
                  ).map_batches(li_side, batch_format="pyarrow")
    ords = _read_pq(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_orderdate",
                             "o_orderpriority"]
                    ).map_batches(ord_side, batch_format="pyarrow")
    j = hash_join(li, ords, key="l_orderkey",
                  left_cols=["ship_day", "ship_year"],
                  right_cols=["order_day", "is_high"],
                  left_types={"l_orderkey": i64, "ship_day": i64,
                              "ship_year": i64},
                  right_types={"l_orderkey": i64, "order_day": i64,
                               "is_high": i64})

    def finish(t: pa.Table) -> pa.Table:
        late = pc.greater_equal(
            pc.subtract(t.column("ship_day"), t.column("order_day")),
            pa.scalar(60, pa.int64()))
        t = t.filter(late)
        lo = pc.subtract(pa.scalar(1, pa.int64()), t.column("is_high"))
        g = pa.table({"ship_year": t.column("ship_year"),
                      "hi": t.column("is_high"), "lo": lo}).group_by(
            "ship_year").aggregate([("hi", "sum"), ("lo", "sum")])
        return pa.table({
            "ship_year": g.column("ship_year"),
            "high_line_count": pc.cast(g.column("hi_sum"), pa.int64()),
            "low_line_count": pc.cast(g.column("lo_sum"), pa.int64())})

    return j.map_batches(finish, batch_format="pyarrow").groupby(
        "ship_year").aggregate(
        Sum("high_line_count", alias_name="high_line_count"),
        Sum("low_line_count", alias_name="low_line_count")).sort(
        "ship_year")


def q_part_supplier_variety(sf_dir: str):
    """TPC-H Q16 shape (parts/supplier relationship): per (brand, type,
    size) the count of DISTINCT suppliers that shipped such parts,
    excluding negative-balance suppliers (the 'customer complaints'
    exclusion analog — this corpus has no s_comment). Part attributes
    are a broadcast lookup; the distinct is one hash_agg over the
    composite (brand, type, size, suppkey) keyed by brand (composite
    groups never straddle partitions); the per-cell count is a second
    per-partition pass over the SAME partitioning (no extra shuffle).
    Top 40 by supplier_cnt."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    part = part.filter(pc.not_equal(part.column("p_type"), "PROMO"))
    pkeys = part.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    n = int(pkeys.max()) + 2
    brand = np.array([""] * n, dtype=object)
    brand[pkeys] = part.column("p_brand").to_pylist()
    ptype = np.array([""] * n, dtype=object)
    ptype[pkeys] = part.column("p_type").to_pylist()
    psize = np.full(n, -1, dtype=np.int64)
    psize[pkeys] = part.column("p_size").to_numpy(
        zero_copy_only=False).astype(np.int64)
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"])
    bad = set(sup.filter(pc.less(sup.column("s_acctbal"), 0)).column(
        "s_suppkey").to_pylist())
    part_ref = ray.put((brand, ptype, psize))
    bad_ref = ray.put(np.array(sorted(bad), dtype=np.int64))

    def prep(t: pa.Table) -> pa.Table:
        br, ty, sz = ray.get(part_ref)
        badk = ray.get(bad_ref)
        pk = t.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        sk = t.column("l_suppkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = (pk < len(sz)) & (sz[np.clip(pk, 0, len(sz) - 1)] >= 0)
        if len(badk):
            keep &= ~np.isin(sk, badk)
        pk, sk = pk[keep], sk[keep]
        out = pa.table({
            "p_brand": pa.array(br[pk].astype(str)),
            "p_type": pa.array(ty[pk].astype(str)),
            "p_size": pa.array(sz[pk], pa.int64()),
            "l_suppkey": pa.array(sk, pa.int64()),
        })
        # map-side distinct shrinks the shuffle
        return out.group_by(
            ["p_brand", "p_type", "p_size", "l_suppkey"]).aggregate([])

    distinct = hash_agg(
        _read_pq(f"{sf_dir}/lineitem.parquet",
                 columns=["l_partkey", "l_suppkey"]
                 ).map_batches(prep, batch_format="pyarrow"),
        "p_brand", [("p_size", "count_all", "one")],
        group_cols=["p_brand", "p_type", "p_size", "l_suppkey"])

    def count_cells(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "p_brand": g.column("p_brand"),
            "p_type": g.column("p_type"),
            "p_size": g.column("p_size"),
            "supplier_cnt": pc.cast(g.column("count_all"), pa.int64())})

    out = map_key_partitions(distinct, "p_brand",
                             count_cells).to_pandas().sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True]).head(40).reset_index(
        drop=True)
    return out[["p_brand", "p_type", "p_size", "supplier_cnt"]]


def q_promotion_suppliers(sf_dir: str):
    """TPC-H Q20 shape (potential part promotion): suppliers who in 1996
    shipped MORE THAN HALF of a 'bolt' part's total 1996 quantity — the
    nested-semi-join chain of Q20 with the availqty>0.5*sum(qty)
    correlated subquery re-expressed on shipped quantities (no partsupp
    table; documented adaptation). Part filter is a broadcast bitmap
    applied map-side; one hash_agg per (part, supplier); the correlated
    per-part total + the >50% filter run inside per-part hash
    partitions (exact locally — every (part, supplier) row of a part is
    co-located); only the distinct supplier ids (bounded by the
    supplier dimension) reach the driver for the name/nation decorate."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    part = part.filter(pc.match_substring(part.column("p_name"), "bolt"))
    pkeys = part.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    part_ok = np.zeros(int(pkeys.max()) + 2, dtype=bool)
    part_ok[pkeys] = True
    part_ref = ray.put(part_ok)

    def prep(t: pa.Table) -> pa.Table:
        pok = ray.get(part_ref)
        pk = t.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        years = t.column("l_shipdate").to_numpy(
            zero_copy_only=False).astype("datetime64[Y]").astype(
            np.int64) + 1970
        keep = (years == 1996) & (pk < len(pok)) & \
            pok[np.clip(pk, 0, len(pok) - 1)]
        t = t.filter(pa.array(keep))
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "qty": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
        })

    per_ps = hash_agg(
        _read_pq(f"{sf_dir}/lineitem.parquet",
                 columns=["l_partkey", "l_suppkey", "l_quantity",
                          "l_shipdate"]
                 ).map_batches(prep, batch_format="pyarrow"),
        "l_partkey", [("qty", "sum", "qty")],
        group_cols=["l_partkey", "l_suppkey"])

    def majority(t: pa.Table) -> pa.Table:
        p = t.column("l_partkey").to_numpy(zero_copy_only=False)
        q = t.column("qty").to_numpy(zero_copy_only=False)
        if not len(p):
            return pa.table({"l_suppkey": pa.array([], pa.int64())})
        starts = segment_starts(p)
        lens = segment_lengths(starts, len(p))
        tot = np.add.reduceat(q, starts)
        keep = 2 * q > np.repeat(tot, lens)
        sk = np.unique(t.column("l_suppkey").to_numpy(
            zero_copy_only=False)[keep])
        return pa.table({"l_suppkey": pa.array(sk, pa.int64())})

    sel = map_key_partitions(per_ps, "l_partkey", majority).to_pandas()
    supp_ids = sorted(set(sel["l_suppkey"])) if len(sel) else []

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name", "s_nationkey"])
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"])
    nnames = dict(zip(nat.column("n_nationkey").to_pylist(),
                      nat.column("n_name").to_pylist()))
    import pandas as pd

    supdf = sup.to_pandas()
    out = supdf[supdf["s_suppkey"].isin(supp_ids)].copy()
    out["n_name"] = out["s_nationkey"].map(nnames)
    out = out.sort_values(["s_name", "s_suppkey"]).reset_index(drop=True)
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out[["s_suppkey", "s_name", "n_name"]]


def q_qty_price_slope(sf_dir: str):
    """Grouped OLS regression slope, exact: per brand, the slope of
    extendedprice (cents) on quantity as the EXACT RATIONAL
    num/den = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²), emitted as decimal
    strings so no float rounding can diverge from the oracle. Per-batch
    int64 partial sums per brand (bounded group set, safe at batch
    scale), merged on the driver with arbitrary-precision Python ints —
    the embedding_covariance policy: int64 would overflow the CROSS
    TERMS (n·Σxy) at corpus scale, the driver merge is O(brands ×
    blocks)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import ray

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    pkeys = part.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    brands = np.array([""] * (int(pkeys.max()) + 2), dtype=object)
    brands[pkeys] = part.column("p_brand").to_pylist()
    brand_ref = ray.put(brands)

    def partial(t: pa.Table) -> pa.Table:
        br = ray.get(brand_ref)
        pk = t.column("l_partkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = pc.cast(pc.round(t.column("l_quantity")),
                    pa.int64()).to_numpy(zero_copy_only=False)
        y = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)),
            pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({
            "p_brand": pa.array(br[pk].astype(str)),
            "n": pa.array(np.ones(len(pk), np.int64)),
            "sx": pa.array(x), "sy": pa.array(y),
            "sxy": pa.array(x * y), "sxx": pa.array(x * x),
        }).group_by("p_brand").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxy", "sum"), ("sxx", "sum")])
        return g.rename_columns(
            ["p_brand", "n", "sx", "sy", "sxy", "sxx"])

    parts = _read_pq(f"{sf_dir}/lineitem.parquet",
                     columns=["l_partkey", "l_quantity",
                              "l_extendedprice"]
                     ).map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    acc: dict[str, list[int]] = {}
    for row in parts.itertuples(index=False):
        a = acc.setdefault(row.p_brand, [0, 0, 0, 0, 0])
        a[0] += int(row.n); a[1] += int(row.sx); a[2] += int(row.sy)
        a[3] += int(row.sxy); a[4] += int(row.sxx)
    import pandas as pd

    rows = []
    for brand in sorted(acc):
        n, sx, sy, sxy, sxx = acc[brand]
        rows.append({"p_brand": brand, "n": n,
                     "slope_num": str(n * sxy - sx * sy),
                     "slope_den": str(n * sxx - sx * sx)})
    out = pd.DataFrame(rows, columns=["p_brand", "n", "slope_num",
                                      "slope_den"])
    out["n"] = out["n"].astype("int64")
    return out


def q_k_anonymity(sf_dir: str):
    """Privacy audit: k-anonymity over the quasi-identifier pair
    (nation, market segment) — cells with fewer than k=10 customers,
    i.e. the combinations whose members are re-identifiable. Per-batch
    partial counts fold the row-scale input into one bounded
    (nations × segments) cell table per block; the final groupby and
    the k filter touch only cell rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "c_mktsegment": t.column("c_mktsegment"),
        }).group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [([], "count_all")])
        return pa.table({"c_nationkey": g.column("c_nationkey"),
                         "c_mktsegment": g.column("c_mktsegment"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/customer.parquet",
                     columns=["c_nationkey", "c_mktsegment"]
                     ).map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    out = cells.groupby(["c_nationkey", "c_mktsegment"], as_index=False)[
        "n"].sum()
    out = out[out["n"] < 10].sort_values(
        ["c_nationkey", "c_mktsegment"]).reset_index(drop=True)
    out["n"] = out["n"].astype("int64")
    return out[["c_nationkey", "c_mktsegment", "n"]]


def q_segment_ttest(sf_dir: str):
    """Welch's t-statistic between every pair of market segments on
    account balance (cents). One pass of per-batch integer partials
    (n, Σx, Σx²) per segment — bounded group set — merged on the driver
    with Python ints (int64-overflow-safe at corpus scale); the t for
    each of the 10 segment pairs is then derived with an op sequence
    EXACTLY mirroring the oracle SQL's double arithmetic (same casts,
    same order — IEEE doubles are deterministic, so the hashes agree
    without any rounding fudge; the embedding_covariance precedent)."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(pc.multiply(t.column("c_acctbal"), 100)),
                    pa.int64()).to_numpy(zero_copy_only=False)
        g = pa.table({
            "seg": t.column("c_mktsegment"),
            "n": pa.array(np.ones(len(x), np.int64)),
            "s": pa.array(x), "ss": pa.array(x * x),
        }).group_by("seg").aggregate(
            [("n", "sum"), ("s", "sum"), ("ss", "sum")])
        return g.rename_columns(["seg", "n", "s", "ss"])

    parts = _read_pq(f"{sf_dir}/customer.parquet",
                     columns=["c_mktsegment", "c_acctbal"]
                     ).map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    acc: dict[str, list[int]] = {}
    for row in parts.itertuples(index=False):
        a = acc.setdefault(row.seg, [0, 0, 0])
        a[0] += int(row.n); a[1] += int(row.s); a[2] += int(row.ss)

    def stats(seg):
        n, s, ss = acc[seg]
        m = float(s) / float(n)
        v = (float(ss) - float(s) * float(s) / float(n)) / float(n - 1)
        return n, m, v

    import pandas as pd

    rows = []
    for a in sorted(acc):
        for b in sorted(acc):
            if a >= b:
                continue
            na, ma, va = stats(a)
            nb, mb, vb = stats(b)
            t = (ma - mb) / math.sqrt(va / float(na) + vb / float(nb))
            rows.append({"seg_a": a, "seg_b": b, "n_a": na, "n_b": nb,
                         "t_stat": t})
    out = pd.DataFrame(rows, columns=["seg_a", "seg_b", "n_a", "n_b",
                                      "t_stat"])
    out["n_a"] = out["n_a"].astype("int64")
    out["n_b"] = out["n_b"].astype("int64")
    return out


def q_event_bursts(sf_dir: str):
    """Burst detection: per user, the MAXIMUM number of events inside
    any 60-second window [t, t+60s] anchored at an event (the SQL RANGE
    CURRENT ROW .. 60s FOLLOWING frame, maxed per user). One hash
    partitioning by user; inside each partition the window counts for
    ALL users are computed by TWO vectorized searchsorted calls over a
    composite (user-rank × span + ts) key — no per-user Python loop —
    then a per-segment reduceat max. Falls back to a per-user slice
    loop only if the composite key would overflow int64 (≳10⁶ distinct
    users × the corpus time span in one partition; raise num_buckets
    long before that)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    WIN = 60_000_000  # 60 s in microseconds

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "t": pa.array(ts_us(t.column("ts")), pa.int64()),
        })

    def bursts(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "max_burst": pa.array([], pa.int64())})
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        nseg = len(starts)
        base = ts - ts.min()
        span = int(base.max()) + WIN + 1
        if nseg * span < (1 << 62):
            seg_id = np.repeat(np.arange(nseg, dtype=np.int64), lens)
            k = seg_id * span + base
            lo = np.searchsorted(k, k, side="left")
            hi = np.searchsorted(k, k + WIN, side="right")
            counts = hi - lo
        else:  # composite key would overflow: per-user slices
            counts = np.empty(len(u), dtype=np.int64)
            for s, ln in zip(starts, lens):
                seg = ts[s:s + ln]
                counts[s:s + ln] = (
                    np.searchsorted(seg, seg + WIN, side="right")
                    - np.searchsorted(seg, seg, side="left"))
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "max_burst": pa.array(
                np.maximum.reduceat(counts, starts), pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", bursts,
                             sort_cols=["t"]).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_sorted_neighbor_dups(sf_dir: str):
    """Sorted-neighborhood near-dup mining (Hernández–Stolfo blocking):
    global sort by a 16-char lowercased prefix key WITHOUT a global
    sort — per-prefix-bucket counts give driver-side rank offsets —
    then a 4-row sliding window over the rank order with boundary-
    replica groups, and exact word-set Jaccard >= 0.5 verification
    vectorized inside each rank-range task (one sorted-membership probe
    per window shift). See stages/dedup.sorted_neighborhood_dups."""
    from magic_content_extractor_ray.stages.dedup import (
        sorted_neighborhood_dups)

    pairs = sorted_neighborhood_dups(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["doc_id", "text"]))
    return pairs.to_pandas().sort_values(
        ["left_id", "right_id"]).reset_index(drop=True)


def q_winsorized_chars(sf_dir: str):
    """Per-language winsorized length statistics: p5/p95 cutpoints as
    EXACT order statistics (1-based rank ceil(n·p/100), pure integer
    arithmetic — no float quantile ambiguity) from the mergeable
    (lang, value) histogram, then the winsorized sum with every value
    clipped to the cutpoints — all from histogram counts, no second
    data pass and nothing row-scale at the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "lang": t.column("lang"),
            "v": pc.cast(t.column("n_chars"), pa.int64()),
        }).group_by(["lang", "v"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"), "v": g.column("v"),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    hist = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["lang", "n_chars"]
                 ).map_batches(partial, batch_format="pyarrow"),
        "lang", [("cnt", "sum", "cnt")], group_cols=["lang", "v"])

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v")
        v = g["v"].to_numpy(dtype="int64")
        cnt = g["cnt"].to_numpy(dtype="int64")
        cum = cnt.cumsum()
        n = int(cum[-1])
        lo_rank = (n * 5 + 99) // 100    # 1-based ceil(n*0.05)
        hi_rank = (n * 95 + 99) // 100
        lo = int(v[np.searchsorted(cum, lo_rank)])
        hi = int(v[np.searchsorted(cum, hi_rank)])
        wsum = int((np.clip(v, lo, hi) * cnt).sum())
        return pd.DataFrame({"lang": [g["lang"].iloc[0]], "n": [n],
                             "lo_cut": [lo], "hi_cut": [hi],
                             "win_sum": [wsum]})

    out = hist.groupby("lang").map_groups(
        per_lang, batch_format="pandas").to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


def q_assoc_rules(sf_dir: str):
    """Association-rule mining (market basket): top-50 co-view item
    pairs by support, with EXACT integer-ppm confidence in both
    directions. Pair supports come from the shared _covis_pair_counts
    pipeline (hub-capped, hash_sum combiner); per-item user counts are
    a catalog-sized aggregate broadcast once; confidences are computed
    only on the 50 winning rows. Everything stays int64-exact:
    conf_ppm = (10^6 · n_both) // n_item (floor), mirrored by DuckDB's
    // integer division."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_sum

    K = 50

    def ui_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks,
        })
        return out.group_by(["user_id", "item"]).aggregate([])

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(ui_prep, batch_format="pyarrow")

    # the (user, item) pre-dedup above is per-BATCH; finish the exact
    # distinct with one composite-key hash_agg, then take per-item user
    # counts (catalog = dimension-sized) to the driver for the
    # confidence denominators
    from magic_content_extractor_ray.stages.window import hash_agg

    def one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(
            np.ones(len(t), np.int64)))

    distinct_ui = hash_agg(ui.map_batches(one, batch_format="pyarrow"),
                           "user_id", [("one", "max", "one")],
                           group_cols=["user_id", "item"])
    item_counts = hash_sum(distinct_ui, "item", "one", "n_item"
                           ).to_pandas()
    ca = dict(zip(item_counts["item"].astype("int64"),
                  item_counts["n_item"].astype("int64")))

    pairs = _covis_pair_counts(sf_dir)

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_users", "descending"),
                                   ("pk", "ascending")], k=K)

    cands = pairs.map_batches(partial_topk, batch_format="pyarrow",
                              batch_size=8192)
    df = cands.to_pandas().sort_values(
        ["n_users", "pk"], ascending=[False, True]).head(K)
    pk = df["pk"].to_numpy(dtype=np.int64)
    a = pk >> np.int64(31)
    b = pk & np.int64((1 << 31) - 1)
    nb = df["n_users"].to_numpy(dtype=np.int64)
    na_ = np.array([ca[int(x)] for x in a], dtype=np.int64)
    nb_ = np.array([ca[int(x)] for x in b], dtype=np.int64)
    out = pd.DataFrame({
        "item_a": a, "item_b": b, "n_both": nb,
        "n_a": na_, "n_b": nb_,
        "conf_ab_ppm": (1_000_000 * nb) // na_,
        "conf_ba_ppm": (1_000_000 * nb) // nb_,
    })
    return out.sort_values(["n_both", "item_a", "item_b"],
                           ascending=[False, True, True]
                           ).reset_index(drop=True)


def q_geo_mean_chars(sf_dir: str):
    """Per-language geometric-mean document length, exactly: Σ ln(v)
    accumulated as integer NANO-NATS with each distinct value's log
    half-up-rounded BEFORE the count-weighted sum (order-independent —
    the term_keyness/user_entropy precedent; math.log == libm == DuckDB
    ln). The derived gm_micro mirrors the oracle's double op sequence
    exactly: exp((s/1e9)/n) then floor(x·1e6 + 0.5)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t.column("n_chars"), 1))
        g = pa.table({
            "lang": t.column("lang"),
            "v": pc.cast(t.column("n_chars"), pa.int64()),
        }).group_by(["lang", "v"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"), "v": g.column("v"),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    hist = hash_agg(
        _read_pq(f"{sf_dir}/documents.parquet",
                 columns=["lang", "n_chars"]
                 ).map_batches(partial, batch_format="pyarrow"),
        "lang", [("cnt", "sum", "cnt")], group_cols=["lang", "v"])

    def per_lang(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy(dtype="int64")
        cnt = g["cnt"].to_numpy(dtype="int64")
        n = int(cnt.sum())
        ln_nano = np.array(
            [math.floor(math.log(float(x)) * 1e9 + 0.5) for x in v],
            dtype=np.int64)
        s = int((ln_nano * cnt).sum())
        gm = math.floor(
            math.exp(float(s) / 1e9 / float(n)) * 1e6 + 0.5)
        return pd.DataFrame({"lang": [g["lang"].iloc[0]], "n": [n],
                             "sum_ln_nano": [s], "gm_micro": [gm]})

    out = hist.groupby("lang").map_groups(
        per_lang, batch_format="pandas").to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


def q_time_weighted_value(sf_dir: str):
    """Per-user TIME-WEIGHTED average event value (the telemetry/IoT
    staple): each event's value (exact cents) holds until the user's
    next event; weights are whole seconds between consecutive events
    (floor), the last event carries no weight. One hash partitioning by
    user sorted by (ts, event_id); numerator/denominator are exact
    int64 segment sums (reduceat — no per-user Python), and the ratio
    is floor centi-cents (100·num // den), DuckDB-mirrorable."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "t": pa.array(ts_us(t.column("ts")), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                t.column("value"), 100)), pa.int64()),
        })

    def twa(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_intervals": pa.array([], pa.int64()),
                             "sum_dt_sec": pa.array([], pa.int64()),
                             "twa_centi": pa.array([], pa.int64())})
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        # interval i: [ts_i, ts_{i+1}) within the user; mask off each
        # segment's last row
        dt = np.zeros(len(u), dtype=np.int64)
        dt[:-1] = (ts[1:] - ts[:-1]) // 1_000_000
        last = starts + lens - 1
        dt[last] = 0
        w = cents * dt
        num = np.add.reduceat(w, starts)
        den = np.add.reduceat(dt, starts)
        nin = lens - 1
        keep = den > 0
        return pa.table({
            "user_id": pa.array(u[starts][keep], pa.int64()),
            "n_intervals": pa.array(nin[keep], pa.int64()),
            "sum_dt_sec": pa.array(den[keep], pa.int64()),
            "twa_centi": pa.array(
                (100 * num[keep]) // den[keep], pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_id", "ts", "value"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", twa,
                             sort_cols=["t", "event_id"]).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_bounce_rate(sf_dir: str):
    """Bounce rate by session ENTRY event type: sessionize (30-min
    inactivity gap, the user_sessions definition, ties broken by
    event_id), take each session's first event type, and report
    sessions / single-event bounces / floor-ppm bounce rate per entry
    type. Per-partition counts are (entry_type)-keyed partials — only a
    handful of rows per partition reach the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, ts_us)

    GAP_US = 1800 * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "t": pa.array(ts_us(t.column("ts")), pa.int64()),
            "event_type": t.column("event_type"),
        })

    def bounces(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table({"entry_type": pa.array([], pa.string()),
                             "n_sessions": pa.array([], pa.int64()),
                             "n_bounces": pa.array([], pa.int64())})
        et = np.asarray(t.column("event_type").to_pylist(), dtype=object)
        new = np.empty(len(u), dtype=bool)
        new[0] = True
        new[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > GAP_US)
        s_start = np.nonzero(new)[0]
        s_len = np.diff(np.append(s_start, len(u)))
        entry = et[s_start]
        bounce = (s_len == 1).astype(np.int64)
        df = pd.DataFrame({"entry_type": entry, "b": bounce})
        g = df.groupby("entry_type", as_index=False).agg(
            n_sessions=("b", "size"), n_bounces=("b", "sum"))
        return pa.table({
            "entry_type": pa.array(g["entry_type"], pa.string()),
            "n_sessions": pa.array(
                g["n_sessions"].to_numpy(dtype="int64"), pa.int64()),
            "n_bounces": pa.array(
                g["n_bounces"].to_numpy(dtype="int64"), pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_id", "ts", "event_type"]
                  ).map_batches(prep, batch_format="pyarrow")
    parts = map_key_partitions(ev, "user_id", bounces,
                               sort_cols=["t", "event_id"]).to_pandas()
    out = parts.groupby("entry_type", as_index=False)[
        ["n_sessions", "n_bounces"]].sum()
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_bounces"] = out["n_bounces"].astype("int64")
    out["bounce_ppm"] = (
        1_000_000 * out["n_bounces"]) // out["n_sessions"]
    return out.sort_values("entry_type").reset_index(drop=True)


def _tag_set_overlap(keyed, *, key: str, tag: str, prefix: str,
                     producer_expands: bool = False):
    """Pairwise SET overlap between tags over distinct (key, tag) pairs
    — the shared machinery of vocab_jaccard_langs / cross_source_dups:
    distinct via one composite-key hash_agg, per-key tag BITMASK via one
    keyed sum (each tag contributes its bit exactly once), then the
    bounded mask histogram (≤ 2^n_tags rows) comes to the driver where
    every pair's |∩| / |∪| is an exact integer fold over mask counts.
    The key set never passes through the driver; two shuffles total.
    Returns a pandas frame ({prefix}_a, {prefix}_b, n_a, n_b, n_common,
    jaccard_ppm) for pairs with a non-empty intersection."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, hash_sum)

    def one(t: pa.Table) -> pa.Table:
        return t.append_column("one", pa.array(
            np.ones(len(t), np.int64)))

    distinct = hash_agg(keyed.map_batches(one, batch_format="pyarrow"),
                        key, [("one", "max", "one")],
                        group_cols=[key, tag],
                        producer_expands=producer_expands)

    # tiny bounded aggregate: the tag list
    tags = sorted(distinct.groupby(tag).count(
    ).to_pandas()[tag].tolist())
    bit = {t_: 1 << i for i, t_ in enumerate(tags)}
    bit_ref = ray.put(bit)

    def to_bits(t: pa.Table) -> pa.Table:
        bits = ray.get(bit_ref)
        lv = np.array([bits[x] for x in t.column(tag).to_pylist()],
                      dtype=np.int64)
        return pa.table({key: t.column(key),
                         "b": pa.array(lv, pa.int64())})

    masks = hash_sum(distinct.map_batches(to_bits,
                                          batch_format="pyarrow"),
                     key, "b", "mask")

    def mask_hist(t: pa.Table) -> pa.Table:
        m = t.column("mask").to_numpy(zero_copy_only=False)
        mu, cnt = np.unique(m, return_counts=True)
        return pa.table({"mask": pa.array(mu, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    hist = masks.map_batches(
        mask_hist, batch_format="pyarrow").to_pandas()
    hist = hist.groupby("mask")["cnt"].sum()
    mvals = hist.index.to_numpy(dtype=np.int64)
    mcnts = hist.to_numpy(dtype=np.int64)

    rows = []
    for i, ta in enumerate(tags):
        for j in range(i + 1, len(tags)):
            tb = tags[j]
            has_a = (mvals & (1 << i)) > 0
            has_b = (mvals & (1 << j)) > 0
            inter = int(mcnts[has_a & has_b].sum())
            n_a = int(mcnts[has_a].sum())
            n_b = int(mcnts[has_b].sum())
            if inter == 0:
                continue
            rows.append({
                f"{prefix}_a": ta, f"{prefix}_b": tb,
                "n_a": n_a, "n_b": n_b, "n_common": inter,
                "jaccard_ppm": (1_000_000 * inter)
                // (n_a + n_b - inter)})
    return pd.DataFrame(rows, columns=[f"{prefix}_a", f"{prefix}_b",
                                       "n_a", "n_b", "n_common",
                                       "jaccard_ppm"])


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


def q_cross_source_dups(sf_dir: str):
    """Cross-SOURCE duplicate-content contamination matrix (mirror /
    re-crawl detection): for every source pair, how many distinct
    LEADING-CONTENT signatures (md5 of the first 200 chars — the
    truncation-twin key at fixed length; full-text md5 finds nothing
    because re-crawls are cut at different depths) appear in BOTH —
    the _tag_set_overlap bitmask machinery over distinct
    (signature, source)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.dedup import add_text_hash

    P = 200

    def prep(t: pa.Table) -> pa.Table:
        pre = pa.table({
            "text": pc.utf8_slice_codeunits(t.column("text"), 0, P),
            "source": t.column("source")})
        h = add_text_hash(pre)
        return pa.table({"h": h.column("text_hash"),
                         "source": t.column("source")}).group_by(
            ["h", "source"]).aggregate([])

    hs = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["text", "source"]
                  ).map_batches(prep, batch_format="pyarrow")
    return _tag_set_overlap(hs, key="h", tag="source", prefix="source")


def q_user_recs(sf_dir: str):
    """Item-based collaborative-filtering recommendations: each user's
    top-3 unseen items scored by Σ co-view counts between the user's
    viewed items and each item's TOP-5 neighbor list. The neighbor
    lists are catalog-sized (≤ 5/item) — broadcast once as flat sorted
    arrays; scoring is one hash partitioning by user with vectorized
    expansion (searchsorted lookups, packed-key seen-filter, segment
    top-3) — no per-user Python. Ties break (score desc, item asc) in
    both engines."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions)

    K = 3
    nbrs = q_item_neighbors(sf_dir)
    nb_df = nbrs.to_pandas() if not isinstance(nbrs, pd.DataFrame) \
        else nbrs
    nb_df = nb_df.sort_values(["item", "nbr"]).reset_index(drop=True)
    items_sorted = nb_df["item"].to_numpy(dtype=np.int64)
    flat_nbr = nb_df["nbr"].to_numpy(dtype=np.int64)
    flat_cnt = nb_df["n_users"].to_numpy(dtype=np.int64)
    ref = ray.put({"items": items_sorted, "nbr": flat_nbr,
                   "cnt": flat_cnt})

    def ui_prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks,
        })
        return out.group_by(["user_id", "item"]).aggregate([])

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(ui_prep, batch_format="pyarrow")

    def recs(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "rnk": pa.array([], pa.int64()),
                          "item": pa.array([], pa.int64()),
                          "score": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        it = t.column("item").to_numpy(zero_copy_only=False)
        if not len(u):
            return empty
        if it.min() < 0 or it.max() >= (1 << 31) or u.min() < 0 \
                or u.max() >= (1 << 32):
            raise ValueError("user_recs packs (user, item) into one "
                             "int64; item ids must be in [0, 2^31) and "
                             "user ids in [0, 2^32)")
        keep = np.ones(len(u), dtype=bool)  # exact (user,item) distinct
        keep[1:] = (u[1:] != u[:-1]) | (it[1:] != it[:-1])
        u, it = u[keep], it[keep]
        lk = ray.get(ref)
        # expand each (user, item) row into the item's neighbor run
        lo = np.searchsorted(lk["items"], it, side="left")
        hi = np.searchsorted(lk["items"], it, side="right")
        runs = hi - lo
        total = int(runs.sum())
        if total == 0:
            return empty
        row = np.repeat(np.arange(len(u)), runs)
        offs = np.concatenate(([0], np.cumsum(runs)[:-1]))
        idx = (np.arange(total, dtype=np.int64)
               - np.repeat(offs, runs) + lo[row])
        cu = u[row]
        cand = lk["nbr"][idx]
        sc = lk["cnt"][idx]
        # drop candidates the user has already seen: packed-key probe
        # against the partition's own (user, item) rows
        seen = np.sort((u.astype(np.int64) << np.int64(31)) | it)
        ck = (cu.astype(np.int64) << np.int64(31)) | cand
        pos = np.searchsorted(seen, ck)
        pos[pos >= len(seen)] = 0
        unseen = seen[pos] != ck
        cu, cand, sc = cu[unseen], cand[unseen], sc[unseen]
        if not len(cu):
            return empty
        # sum scores per (user, candidate): sort + segmented reduce
        order = np.lexsort((cand, cu))
        cu, cand, sc = cu[order], cand[order], sc[order]
        new = np.empty(len(cu), dtype=bool)
        new[0] = True
        new[1:] = (cu[1:] != cu[:-1]) | (cand[1:] != cand[:-1])
        starts = np.nonzero(new)[0]
        gu, gc = cu[starts], cand[starts]
        gs = np.add.reduceat(sc, starts)
        # per-user top-3 by (score desc, item asc)
        order2 = np.lexsort((gc, -gs, gu))
        gu, gc, gs = gu[order2], gc[order2], gs[order2]
        ng = np.empty(len(gu), dtype=bool)
        ng[0] = True
        ng[1:] = gu[1:] != gu[:-1]
        gstart = np.nonzero(ng)[0]
        rnk = np.arange(len(gu), dtype=np.int64) - np.repeat(
            gstart, np.diff(np.append(gstart, len(gu)))) + 1
        m = rnk <= K
        return pa.table({
            "user_id": pa.array(gu[m], pa.int64()),
            "rnk": pa.array(rnk[m], pa.int64()),
            "item": pa.array(gc[m], pa.int64()),
            "score": pa.array(gs[m], pa.int64())})

    out = map_key_partitions(ui, "user_id", recs,
                             sort_cols=["item"]).to_pandas()
    return out.sort_values(["user_id", "rnk"]).reset_index(drop=True)


def q_score_calibration(sf_dir: str):
    """Decile calibration curve (classifier-eval staple): global
    NTILE(10) bins over (value-cents, event_id) — exact SQL NTILE
    semantics (first n%10 bins take one extra row), ranks from the
    distributed two-phase prefix-sum (no global sort) — and the
    purchase rate per bin in floor ppm."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["event_id", "event_type", "value"])
    n_total = ev.count()
    q, r = divmod(n_total, 10)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "cents": pc.cast(pc.round(pc.multiply(
                t.column("value"), 100)), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "pos": pc.cast(pc.equal(t.column("event_type"), "purchase"),
                           pa.int64()),
            "one": pa.array(np.ones(len(t), np.int64)),
        })

    # bucket_width must partition the KEY DOMAIN (cents ~ [0, 5e4]) —
    # the default 100_000 would put every row in bucket 0 and serialize
    # the rank pass into one task
    ranked = keyed_prefix_sum(
        ev.map_batches(prep, batch_format="pyarrow"),
        key_column="cents", value_column="one",
        tie_column="event_id", out_column="rk", bucket_width=256)

    def binify(df: pd.DataFrame) -> pd.DataFrame:
        rank = df["rk"].to_numpy(dtype="int64") + 1  # 1-based
        cut = r * (q + 1)
        first = rank <= cut
        bins = np.where(first, 1 + (rank - 1) // max(q + 1, 1),
                        r + 1 + (rank - cut - 1) // max(q, 1))
        out = pd.DataFrame({"bin": bins.astype("int64"),
                            "pos": df["pos"].to_numpy(dtype="int64")})
        g = out.groupby("bin", as_index=False).agg(
            n=("pos", "size"), n_pos=("pos", "sum"))
        return g

    parts = ranked.map_batches(binify, batch_format="pandas"
                               ).to_pandas()
    out = parts.groupby("bin", as_index=False)[["n", "n_pos"]].sum()
    out["n"] = out["n"].astype("int64")
    out["n_pos"] = out["n_pos"].astype("int64")
    out["pos_rate_ppm"] = (1_000_000 * out["n_pos"]) // out["n"]
    return out.sort_values("bin").reset_index(drop=True)


def q_embedding_dim_median(sf_dir: str):
    """Per-DIMENSION median of the embedding distribution (robust-scaler
    fit over a vector column): values micro-quantized half-away (DuckDB
    round), per-batch (dim, value) count partials, one bounded shuffle
    of histogram cells, and the exact lower weighted-median rule
    (min v with 2·cumweight ≥ total — the weighted_median precedent)
    inside a per-dim segment kernel. Raw vectors never shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(
            zero_copy_only=False).astype(np.float64)
        lengths = pc.list_value_length(emb).to_numpy(
            zero_copy_only=False).astype(np.int64)
        starts = np.cumsum(lengths) - lengths
        pos = np.arange(len(flat), dtype=np.int64) - np.repeat(
            starts, lengths) + 1
        v = flat * 1e6
        micro = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        g = pa.table({"dim": pa.array(pos, pa.int64()),
                      "v": pa.array(micro, pa.int64())}).group_by(
            ["dim", "v"]).aggregate([([], "count_all")])
        return pa.table({"dim": g.column("dim"), "v": g.column("v"),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    hist = hash_agg(
        _read_pq(f"{sf_dir}/embeddings.parquet", columns=["embedding"]
                 ).map_batches(partial, batch_format="pyarrow"),
        "dim", [("cnt", "sum", "cnt")], group_cols=["dim", "v"])

    def per_dim(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v")
        cnt = g["cnt"].to_numpy(dtype="int64")
        v = g["v"].to_numpy(dtype="int64")
        cum = cnt.cumsum()
        tot = int(cum[-1])
        med = int(v[np.searchsorted(2 * cum, tot)])
        return pd.DataFrame({"dim": [int(g["dim"].iloc[0])],
                             "n": [tot], "median_micro": [med]})

    out = hist.groupby("dim").map_groups(
        per_dim, batch_format="pandas").to_pandas()
    return out.sort_values("dim").reset_index(drop=True)


def q_improving_users(sf_dir: str):
    """Monotone-engagement cohort: users whose WEEKLY purchase counts
    never decrease over their active weeks (weeks with ≥1 purchase;
    ≥3 such weeks — the fixture's events span ~4 weeks, so weekly is
    the granularity where the monotone screen has teeth: 16/150 users
    at sf0.01). Per-batch (user, week) count partials → one
    composite-key hash_agg → a per-user segment kernel (vectorized
    diff over week-sorted runs). Only (user, week, count) cells ever
    shuffle."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts,
        ts_us)

    WEEK_US = 7 * 86_400_000_000

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        week = pa.array(ts_us(t.column("ts")) // WEEK_US, pa.int64())
        g = pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "week": week,
        }).group_by(["user_id", "week"]).aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "week": g.column("week"),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    cells = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "event_type", "ts"]
                 ).map_batches(partial, batch_format="pyarrow"),
        "user_id", [("cnt", "sum", "cnt")],
        group_cols=["user_id", "week"])

    def screen(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        c = t.column("cnt").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_weeks": pa.array([], pa.int64()),
                             "first_cnt": pa.array([], pa.int64()),
                             "last_cnt": pa.array([], pa.int64())})
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        # rows sorted (user, week): non-decreasing = every in-segment
        # diff >= 0
        inc = np.ones(len(u), dtype=bool)
        inc[1:] = c[1:] >= c[:-1]
        inc[starts] = True
        ok_inc = np.logical_and.reduceat(inc, starts)
        keep = (lens >= 3) & ok_inc
        last = starts + lens - 1
        return pa.table({
            "user_id": pa.array(u[starts][keep], pa.int64()),
            "n_weeks": pa.array(lens[keep], pa.int64()),
            "first_cnt": pa.array(c[starts][keep], pa.int64()),
            "last_cnt": pa.array(c[last][keep], pa.int64())})

    out = map_key_partitions(cells, "user_id", screen,
                             sort_cols=["week"]).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_revenue_changepoint(sf_dir: str):
    """CUSUM change-point over the daily order-revenue series: the day
    k maximizing |n·P_k − k·S| (the mean-shift CUSUM statistic kept in
    EXACT integers — n·prefix − k·total avoids the mean division;
    ties → earliest day). The distributed part is the bounded daily
    aggregate; the CUSUM fold runs on the driver over n_days rows."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100)), pa.int64())
        ts = t.column("o_orderdate")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        day = pa.array(ts.to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64) // 86_400_000_000,
            pa.int64())
        g = pa.table({"day": day, "cents": cents}).group_by(
            "day").aggregate([("cents", "sum")])
        return pa.table({"day": g.column("day"),
                         "cents": pc.cast(g.column("cents_sum"),
                                          pa.int64())})

    daily = _read_pq(f"{sf_dir}/orders.parquet",
                     columns=["o_orderdate", "o_totalprice"]
                     ).map_batches(partial, batch_format="pyarrow"
                                   ).groupby("day").aggregate(
        Sum("cents", alias_name="cents")).to_pandas()
    daily = daily.sort_values("day").reset_index(drop=True)
    x = [int(v) for v in daily["cents"]]  # exact Python ints: n·P can
    n = len(x)                            # exceed int64 at corpus scale
    s = sum(x)
    best_k, best_val, p = 0, -1, 0
    for k in range(1, n + 1):
        p += x[k - 1]
        val = abs(n * p - k * s)
        if val > best_val:
            best_k, best_val = k, val
    return pd.DataFrame({
        "day": [int(daily["day"].iloc[best_k - 1])],
        "k": [best_k], "n_days": [n],
        "cusum_abs": [best_val]})


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


def q_trailing_spend(sf_dir: str):
    """Per-event TRAILING 1-hour spend (the time-RANGE window family:
    SUM OVER RANGE INTERVAL 1 HOUR PRECEDING AND CURRENT ROW per user,
    purchases only): one hash partitioning by user; inside each
    partition every user's trailing sums come from ONE prefix-sum +
    two searchsorted calls over a composite (user-rank × span + ts)
    key — the event_bursts kernel shape, summing instead of counting.
    RANGE semantics (all ties at the same ts included) fall out of the
    side='right' upper bound."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    WIN = 3_600_000_000  # 1 h in microseconds

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "purchase"))
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "t": pa.array(ts_us(t.column("ts")), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                t.column("value"), 100)), pa.int64()),
        })

    def trailing(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        eid = t.column("event_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "user_id": pa.array([], pa.int64()),
                             "spend_1h_c": pa.array([], pa.int64())})
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        nseg = len(starts)
        base = ts - ts.min()
        span = int(base.max()) + WIN + 1
        pref = np.concatenate(([0], np.cumsum(cents)))
        if nseg * span < (1 << 62):
            seg_id = np.repeat(np.arange(nseg, dtype=np.int64), lens)
            k = seg_id * span + base
            lo = np.searchsorted(k, k - WIN, side="left")
            # clamp window starts to the segment start (k - WIN can
            # reach into the previous user's key range)
            lo = np.maximum(lo, np.repeat(starts, lens))
            hi = np.searchsorted(k, k, side="right")
            sums = pref[hi] - pref[lo]
        else:  # composite key would overflow: per-user slices
            sums = np.empty(len(u), dtype=np.int64)
            for s, ln in zip(starts, lens):
                seg = ts[s:s + ln]
                p = np.concatenate(([0], np.cumsum(cents[s:s + ln])))
                lo = np.searchsorted(seg, seg - WIN, side="left")
                hi = np.searchsorted(seg, seg, side="right")
                sums[s:s + ln] = p[hi] - p[lo]
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(u, pa.int64()),
            "spend_1h_c": pa.array(sums, pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_id", "ts", "event_type",
                           "value"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", trailing,
                             sort_cols=["t", "event_id"]).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_merge_orders(sf_dir: str):
    """MERGE INTO semantics (warehouse DML completeness): a
    deterministic synthetic change feed — keys ≡0 (mod 11) update
    price +10.00, keys ≡0 (mod 13) delete, and every key ≡0 (mod 17)
    re-inserts under key+10^9 — merged into orders. Because the feed
    is key-derived, the merge is a pure map (zero shuffle); the
    join-backed merge path (change feed as a second table) is
    exercised by upsert_orders / hash_join's anti mode. Verification
    collapses the merged table to per-status (n_orders,
    revenue_cents)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def merge_batch(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100)), pa.int64()).to_numpy(
            zero_copy_only=False).copy()
        status = t.column("o_orderstatus")
        # WHEN MATCHED AND k%13==0 THEN DELETE
        keep = (k % 13) != 0
        # WHEN MATCHED AND k%11==0 THEN UPDATE price += 10.00
        cents = np.where((k % 11) == 0, cents + 1000, cents)
        # WHEN NOT MATCHED (change rows keyed k+1e9 for k%17==0)
        # THEN INSERT with price 50.00 and status 'N'
        ins = (k % 17) == 0
        out_k = np.concatenate([k[keep], k[ins] + 1_000_000_000])
        out_c = np.concatenate(
            [cents[keep], np.full(int(ins.sum()), 5000, np.int64)])
        out_s = pa.concat_arrays(
            [status.filter(pa.array(keep)).combine_chunks(),
             pa.array(["N"] * int(ins.sum()), pa.string())])
        g = pa.table({"o_orderstatus": out_s,
                      "n": pa.array(np.ones(len(out_k), np.int64)),
                      "cents": pa.array(out_c)}).group_by(
            "o_orderstatus").aggregate([("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["o_orderstatus", "n_orders",
                                 "revenue_cents"])

    return _read_pq(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_orderstatus",
                             "o_totalprice"]
                    ).map_batches(merge_batch, batch_format="pyarrow"
                                  ).groupby("o_orderstatus").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents")).sort(
        "o_orderstatus")


def q_smb_join_revenue(sf_dir: str):
    """SHUFFLE-FREE big-big join via a sort-merge-bucket layout
    (stages/join.smb_write / smb_join): orders and customer are
    persisted ONCE per corpus as co-partitioned Hive buckets
    (custkey % 32), after which every join is bucket-local — one Ray
    task per bucket opens exactly its two partition directories; no
    all-to-all exchange at any scale (the layout cost is paid at write
    time and amortized over every subsequent join). Result: per-segment
    order counts + revenue cents, oracle-checked against the plain
    join."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.join import (
        smb_join, smb_write)

    B = 32
    base = f"/tmp/mce_smb_{os.path.basename(os.path.normpath(sf_dir))}"
    if not os.path.exists(f"{base}/_DONE"):
        if os.path.exists(base):
            shutil.rmtree(base)

        def o_prep(t: pa.Table) -> pa.Table:
            return pa.table({
                "custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "cents": pc.cast(pc.round(pc.multiply(
                    t.column("o_totalprice"), 100)), pa.int64())})

        def c_prep(t: pa.Table) -> pa.Table:
            return pa.table({
                "custkey": pc.cast(t.column("c_custkey"), pa.int64()),
                "c_mktsegment": t.column("c_mktsegment")})

        smb_write(_read_pq(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]
                           ).map_batches(o_prep, batch_format="pyarrow"),
                  f"{base}/orders", key="custkey", num_buckets=B)
        smb_write(_read_pq(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]
                           ).map_batches(c_prep, batch_format="pyarrow"),
                  f"{base}/customer", key="custkey", num_buckets=B)
        open(f"{base}/_DONE", "w").close()

    joined = smb_join(f"{base}/orders", f"{base}/customer",
                      key="custkey", num_buckets=B,
                      left_cols=["cents"], right_cols=["c_mktsegment"])

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        g = pa.table({
            "c_mktsegment": t.column("c_mktsegment"),
            "n": pa.array(np.ones(len(t), np.int64)),
            "cents": t.column("cents"),
        }).group_by("c_mktsegment").aggregate(
            [("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["c_mktsegment", "n_orders",
                                 "revenue_cents"])

    return joined.map_batches(partial, batch_format="pyarrow").groupby(
        "c_mktsegment").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents")).sort(
        "c_mktsegment")


def q_rapid_reorders(sf_dir: str):
    """Rapid-reorder screen on the ORDERS fact: per customer, how many
    consecutive order pairs (date order, orderkey tie-break) were
    placed within 24 hours — plus the customer's order count. One hash
    partitioning by custkey; diffs are a vectorized segment kernel.
    Customers with ≥1 rapid pair only."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    DAY_US = 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "okey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "t": pa.array(ts_us(t.column("o_orderdate")), pa.int64()),
        })

    def rapid(t: pa.Table) -> pa.Table:
        c = t.column("custkey").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        if not len(c):
            return pa.table({"custkey": pa.array([], pa.int64()),
                             "n_orders": pa.array([], pa.int64()),
                             "n_rapid": pa.array([], pa.int64())})
        starts = segment_starts(c)
        lens = segment_lengths(starts, len(c))
        quick = np.zeros(len(c), dtype=np.int64)
        quick[1:] = (ts[1:] - ts[:-1] <= DAY_US).astype(np.int64)
        quick[starts] = 0
        n_rapid = np.add.reduceat(quick, starts)
        keep = n_rapid >= 1
        return pa.table({
            "custkey": pa.array(c[starts][keep], pa.int64()),
            "n_orders": pa.array(lens[keep], pa.int64()),
            "n_rapid": pa.array(n_rapid[keep], pa.int64())})

    ords = _read_pq(f"{sf_dir}/orders.parquet",
                    columns=["o_custkey", "o_orderkey", "o_orderdate"]
                    ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ords, "custkey", rapid,
                             sort_cols=["t", "okey"]).to_pandas()
    return out.sort_values("custkey").reset_index(drop=True)


def q_item_abandonment(sf_dir: str):
    """Per-item view→purchase ABANDONMENT: distinct viewers vs distinct
    buyers per item and the floor-ppm conversion — the per-item funnel
    twin of the user-level funnel_counts. Distinct (item, type, user)
    via per-batch pre-dedup + one composite hash_agg; per-item counts
    via one more keyed sum."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def prep(batch: pa.Table) -> pa.Table:
        m = pc.or_(pc.equal(batch.column("event_type"), "view"),
                   pc.equal(batch.column("event_type"), "purchase"))
        t = batch.filter(m)
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        out = pa.table({
            "item": ks,
            "etype": t.column("event_type"),
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
        }).group_by(["item", "etype", "user_id"]).aggregate([])
        return out.append_column(
            "one", pa.array(np.ones(len(out), np.int64)))

    triples = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["user_id", "event_type", "props"]
                 ).map_batches(prep, batch_format="pyarrow"),
        "item", [("one", "max", "one")],
        group_cols=["item", "etype", "user_id"])

    def fold(t: pa.Table) -> pa.Table:
        is_v = pc.cast(pc.equal(t.column("etype"), "view"),
                       pa.int64())
        is_p = pc.cast(pc.equal(t.column("etype"), "purchase"),
                       pa.int64())
        g = pa.table({"item": t.column("item"),
                      "viewers": is_v, "buyers": is_p}).group_by(
            "item").aggregate([("viewers", "sum"), ("buyers", "sum")])
        return g.rename_columns(["item", "viewers", "buyers"])

    counts = hash_agg(triples.map_batches(fold, batch_format="pyarrow"),
                      "item", [("viewers", "sum", "viewers"),
                               ("buyers", "sum", "buyers")]).to_pandas()
    out = counts[counts["viewers"] > 0].copy()
    out["viewers"] = out["viewers"].astype("int64")
    out["buyers"] = out["buyers"].astype("int64")
    out["conv_ppm"] = (1_000_000 * out["buyers"]) // out["viewers"]
    return out.sort_values("item").reset_index(drop=True)[
        ["item", "viewers", "buyers", "conv_ppm"]]


def q_events_grouping_sets(sf_dir: str):
    """GROUP BY GROUPING SETS ((type), (hour), (type, hour), ()) in one
    input pass: each batch emits all four grouping-set partials (null
    dimensions as 'ALL'/-1 sentinels so one composite hash_agg merges
    every set — no per-set re-scan, no rollup shuffle chain)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        base = pa.table({
            "etype": t.column("event_type"),
            "hour": pc.cast(pc.hour(ts), pa.int64()),
        })
        n = len(base)
        outs = []
        for keep_t, keep_h in ((True, False), (False, True),
                               (True, True), (False, False)):
            g = pa.table({
                "etype": base.column("etype") if keep_t
                else pa.array(["ALL"] * n, pa.string()),
                "hour": base.column("hour") if keep_h
                else pa.array([-1] * n, pa.int64()),
            }).group_by(["etype", "hour"]).aggregate([([], "count_all")])
            outs.append(pa.table({
                "etype": g.column("etype"), "hour": g.column("hour"),
                "n": pc.cast(g.column("count_all"), pa.int64())}))
        return pa.concat_tables(outs)

    out = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["event_type", "ts"]
                 ).map_batches(partial, batch_format="pyarrow"),
        "etype", [("n", "sum", "n")],
        group_cols=["etype", "hour"]).to_pandas()
    return out.sort_values(["etype", "hour"]).reset_index(drop=True)


def q_weekday_revenue(sf_dir: str):
    """Order volume + revenue by ISO weekday (calendar-dimension
    rollup): pyarrow day_of_week (Mon=0) shifted to DuckDB's isodow
    (Mon=1); exact-cents combiner partials, 7-row output."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        ts = t.column("o_orderdate")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        dow = pc.add(pc.cast(pc.day_of_week(ts), pa.int64()), 1)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"isodow": dow,
                      "n": pa.array(np.ones(len(t), np.int64)),
                      "cents": cents}).group_by("isodow").aggregate(
            [("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["isodow", "n_orders", "revenue_cents"])

    return _read_pq(f"{sf_dir}/orders.parquet",
                    columns=["o_orderdate", "o_totalprice"]
                    ).map_batches(partial, batch_format="pyarrow"
                                  ).groupby("isodow").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents")).sort("isodow")


def q_fim_split(sf_dir: str):
    """Fill-in-the-middle transform (code-model data prep): two
    deterministic md5-derived cut points per doc split it into
    prefix/middle/suffix, re-emitted in SPM order (suffix‖prefix‖
    middle) and fingerprinted. Cut points are a pure function of
    doc_id (the stratified_sample md5 idiom), so the transform is
    resumable and SQL-twinnable; the per-doc slicing is inherently
    per-document work. Docs with < 3 chars are excluded."""
    import hashlib

    import pandas as pd
    import pyarrow as pa

    def split(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out_id, out_n, out_p1, out_p2, out_h = [], [], [], [], []
        for d, txt in zip(ids, texts):
            n = len(txt)
            if n < 3:
                continue
            a = int(hashlib.md5(f"{d}:1".encode()).hexdigest()[:8],
                    16) % (n - 1) + 1
            b = int(hashlib.md5(f"{d}:2".encode()).hexdigest()[:8],
                    16) % (n - 1) + 1
            p1, p2 = min(a, b), max(a, b)
            spm = txt[p2:] + txt[:p1] + txt[p1:p2]
            out_id.append(d)
            out_n.append(n)
            out_p1.append(p1)
            out_p2.append(p2)
            out_h.append(hashlib.md5(spm.encode("utf-8")).hexdigest())
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "n_chars": pa.array(out_n, pa.int64()),
            "p1": pa.array(out_p1, pa.int64()),
            "p2": pa.array(out_p2, pa.int64()),
            "spm_md5": pa.array(out_h, pa.string())})

    out = _read_pq(f"{sf_dir}/documents.parquet",
                   columns=["doc_id", "text"]
                   ).map_batches(split,
                                 batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_exact_median_price(sf_dir: str):
    """Exact lower-median of lineitem extendedprice (cents) via the
    DISTRIBUTED QUICKSELECT (stages/stats.kth_smallest_int) — the
    unbounded-distinct-cardinality answer where the value-histogram
    quantile path would carry O(distinct) state: a sample brackets the
    rank, then counting passes + one ≤1M-value window reach the driver.
    k = (n+1)//2 (lower median, deterministic for even n)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.stats import kth_smallest_int

    def cents(t: pa.Table) -> pa.Table:
        return pa.table({"v": pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), 100)), pa.int64())})

    ds = _read_pq(f"{sf_dir}/lineitem.parquet",
                  columns=["l_extendedprice"]
                  ).map_batches(cents, batch_format="pyarrow")
    n = ds.count()
    k = (n + 1) // 2
    med, n_total = kth_smallest_int(ds, value_column="v", k=k)
    return pd.DataFrame({"n": [n_total], "k": [k],
                         "median_cents": [med]})


def q_linear_attribution(sf_dir: str):
    """LINEAR multi-touch attribution with a 24 h window: every
    purchase splits 1e6 ppm of credit EQUALLY (floor) over all clicks
    strictly preceding it (ts, event_id order) within 24 h; per-item
    totals, top-20. One per-user hash partition pass: window bounds
    via the composite-key searchsorted (event_bursts shape), then a
    vectorized range expansion over click-index space — expansion is
    bounded by each user's 24 h click volume."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts,
        ts_us)

    HORIZON_US = 24 * 3600 * 1_000_000
    K = 20

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["click", "purchase"]))
        t = batch.filter(mask)
        items = pc.cast(pc.struct_field(pc.extract_regex(
            t.column("props"), r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64()) if t.num_rows else pa.array([], pa.int64())
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "t": pa.array(ts_us(t.column("ts")), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "is_click": pc.equal(t.column("event_type"), "click"),
            "item": items})

    def credit(t: pa.Table) -> pa.Table:
        empty = pa.table({"item": pa.array([], pa.int64()),
                          "n_touches": pa.array([], pa.int64()),
                          "credit_ppm": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        isc = t.column("is_click").to_numpy(zero_copy_only=False)
        it = t.column("item").to_numpy(zero_copy_only=False)
        n = len(u)
        if n == 0:
            return empty
        starts = segment_starts(u)
        lens = segment_lengths(starts, n)
        seg_start = np.repeat(starts, lens)
        # first in-segment index with ts >= t_i - HORIZON
        base = ts - ts.min()
        span = int(base.max()) + HORIZON_US + 1
        seg_id = np.repeat(np.arange(len(starts), dtype=np.int64),
                           lens)
        key = seg_id * span + base
        lo = np.searchsorted(key, key - HORIZON_US, side="left")
        lo = np.maximum(lo, seg_start)
        # map position space -> click-index space
        cpos = np.nonzero(isc)[0]
        pidx = np.nonzero(~isc)[0]
        cl_lo = np.searchsorted(cpos, lo[pidx])
        cl_hi = np.searchsorted(cpos, pidx)
        counts = cl_hi - cl_lo
        sel = counts > 0
        pidx, cl_lo, counts = pidx[sel], cl_lo[sel], counts[sel]
        if not len(pidx):
            return empty
        total = int(counts.sum())
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        j = (np.arange(total, dtype=np.int64)
             - np.repeat(offs, counts)
             + np.repeat(cl_lo, counts))
        items = it[cpos[j]]
        cr = np.repeat(1_000_000 // counts, counts)
        iu, inv = np.unique(items, return_inverse=True)
        return pa.table({
            "item": pa.array(iu, pa.int64()),
            "n_touches": pa.array(np.bincount(
                inv, minlength=len(iu)).astype(np.int64), pa.int64()),
            "credit_ppm": pa.array(np.bincount(
                inv, weights=cr, minlength=len(iu)).astype(np.int64),
                pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type",
                           "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    counts = hash_agg(
        map_key_partitions(ev, "user_id", credit,
                           sort_cols=["t", "event_id"]),
        "item", [("n_touches", "sum", "n_touches"),
                 ("credit_ppm", "sum", "credit_ppm")])

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("credit_ppm", "descending"),
                                   ("item", "ascending")], k=K)

    df = counts.map_batches(partial_topk, batch_format="pyarrow"
                            ).to_pandas()
    return df.sort_values(["credit_ppm", "item"],
                          ascending=[False, True]).head(K
                                                        ).reset_index(
        drop=True)[["item", "n_touches", "credit_ppm"]]


def q_dp_lang_counts(sf_dir: str):
    """Differentially-private per-language doc counts (ε=1 Laplace,
    sensitivity 1) with SEEDED noise: the Laplace draw is the inverse
    CDF of an md5-derived uniform (u from the first 8 hex of
    md5('dp:'+lang)), so the release is reproducible and
    SQL-twinnable — the oracle replays the identical double op
    sequence (IEEE determinism, the segment_ttest precedent). True
    counts are exact combiner partials; only the bounded lang table
    reaches the driver."""
    import hashlib
    import math

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        g = pa.table({"lang": t.column("lang"),
                      "n": pa.array(np.ones(len(t), np.int64))}
                     ).group_by("lang").aggregate([("n", "sum")])
        return g.rename_columns(["lang", "n"])

    counts = _read_pq(f"{sf_dir}/documents.parquet", columns=["lang"]
                      ).map_batches(partial, batch_format="pyarrow"
                                    ).groupby("lang").aggregate(
        Sum("n", alias_name="n")).to_pandas()

    rows = []
    for lang, c in zip(counts["lang"], counts["n"]):
        h = int(hashlib.md5(f"dp:{lang}".encode()).hexdigest()[:8], 16)
        u = (float(h) + 0.5) / 4294967296.0
        s = u - 0.5
        noise = -1.0 * math.copysign(1.0, s) * math.log(
            1.0 - 2.0 * abs(s))
        rows.append({"lang": lang, "n_true": int(c),
                     "n_dp": math.floor(float(int(c)) + noise)})
    out = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    out["n_dp"] = out["n_dp"].astype("int64")
    return out


def q_event_debounce(sf_dir: str):
    """Streaming window dedup (debounce): per (user_id, event_type),
    events ordered by (ts, event_id); an event is KEPT iff it is the
    group's first or its timestamp is >= 24 h after the LAST KEPT
    event. This is the greedy anchor chain — NOT sessionization:
    closely spaced events over a long span re-arm once the window
    from the last kept anchor expires (0, 5, 12 with W=10 keeps
    {0, 12}; gap-sessionization would keep only {0}). One hash
    partition pass by user; inside each (user, type) segment the
    chain is walked with searchsorted JUMPS — O(kept · log n) work,
    no per-event Python step. The SQL twin follows the same chain
    with a recursive CTE."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, ts_us)

    W = 86_400_000_000  # 24 h in microseconds

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "t": pa.array(ts_us(t.column("ts")), pa.int64()),
        })

    def debounce(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "event_id": pa.array([], pa.int64()),
                             "ts_us": pa.array([], pa.int64())})
        codes = pc.dictionary_encode(
            t.column("event_type").combine_chunks()).indices.to_numpy(
            zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        change = (u[1:] != u[:-1]) | (codes[1:] != codes[:-1])
        starts = np.flatnonzero(np.r_[True, change])
        ends = np.r_[starts[1:], len(u)]
        keep = np.zeros(len(u), dtype=bool)
        for s, e in zip(starts, ends):
            seg = ts[s:e]
            i = 0
            while i < e - s:
                keep[s + i] = True
                i = int(np.searchsorted(seg, seg[i] + W, side="left"))
        kept = t.filter(pa.array(keep))
        return pa.table({"user_id": kept.column("user_id"),
                         "event_type": kept.column("event_type"),
                         "event_id": kept.column("event_id"),
                         "ts_us": kept.column("t")})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "event_id", "ts"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", debounce,
                             sort_cols=["event_type", "t", "event_id"]
                             ).to_pandas()
    return out.sort_values(["user_id", "event_type", "ts_us"]
                           ).reset_index(drop=True)


def q_link_prediction(sf_dir: str):
    """Adamic-Adar link prediction over the co-view item graph: edges
    are item pairs co-viewed by >= 2 distinct users (from the shared
    _covis_pair_counts pipeline); for every NON-edge pair (a, b) the
    score is sum over common neighbors c of 1/ln(deg(c)), in half-up
    integer nano-units so the sum is order-independent. Wedges are
    generated per NODE inside one hash partition (the node's full
    neighbor list is co-located, so deg(c) and the pair fan-out come
    from segment lengths — no separate degree pass); existing edges
    are removed by a TAGGED-UNION exchange, not a driver-side set
    (edge sets at corpus scale exceed driver memory). Per-node
    fan-out is bounded by the same hub cap as covisitation. ln via
    math.log per DISTINCT degree (libm, matches DuckDB's ln — np.log's
    SIMD path is not guaranteed last-bit-identical). Top-20 by
    (score desc, item_a, item_b)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    MIN_USERS = 2
    K = 20

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    def wedges(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(
            zero_copy_only=False).astype(np.int64)
        nbr = t.column("nbr").to_numpy(
            zero_copy_only=False).astype(np.int64)
        node, nbr = _cap_user_items(node, nbr)
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        sel = lens >= 2
        starts, lens = starts[sel], lens[sel]
        counts = lens * (lens - 1) // 2
        total = int(counts.sum())
        if total == 0:
            return pa.table({"pk": pa.array([], pa.int64()),
                             "w": pa.array([], pa.int64()),
                             "nc": pa.array([], pa.int64()),
                             "is_edge": pa.array([], pa.int64())})
        # half-up nano-unit weight per DISTINCT degree, libm ln
        wmap = {int(d): int(math.floor(1e9 / math.log(float(d)) + 0.5))
                for d in np.unique(lens)}
        seg = np.repeat(np.arange(len(lens)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        tloc = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        length = lens[seg]
        a = (length - 2 - np.floor(
            (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0)
             - 1.0) / 2.0)).astype(np.int64)
        b = tloc + a + 1 - length * (length - 1) // 2 \
            + (length - a) * (length - a - 1) // 2
        base = starts[seg]
        x, y = nbr[base + a], nbr[base + b]
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        pk = (lo << np.int64(31)) | hi
        w = np.array([wmap[int(d)] for d in np.unique(lens)],
                     np.int64)[np.searchsorted(np.unique(lens), length)]
        pku, inv = np.unique(pk, return_inverse=True)
        return pa.table({
            "pk": pa.array(pku, pa.int64()),
            "w": pa.array(np.bincount(inv, weights=w).astype(np.int64),
                          pa.int64()),
            "nc": pa.array(np.bincount(inv).astype(np.int64), pa.int64()),
            "is_edge": pa.array(np.zeros(len(pku), np.int64), pa.int64())})

    def tag_edges(t: pa.Table) -> pa.Table:
        n = len(t)
        z = pa.array(np.zeros(n, np.int64), pa.int64())
        return pa.table({"pk": t.column("pk"), "w": z, "nc": z,
                         "is_edge": pa.array(np.ones(n, np.int64),
                                             pa.int64())})

    adj = edges.map_batches(symmetrize, batch_format="pyarrow")
    wedge_counts = map_key_partitions(adj, "node", wedges,
                                      sort_cols=["nbr"])
    edge_rows = edges.map_batches(tag_edges, batch_format="pyarrow")
    merged = hash_agg(wedge_counts.union(edge_rows), "pk",
                      [("w", "sum", "score_nano"),
                       ("nc", "sum", "n_common"),
                       ("is_edge", "sum", "is_edge")])
    cand = merged.filter(lambda r: r["is_edge"] == 0)

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("score_nano", "descending"),
                                   ("pk", "ascending")], k=K)

    df = cand.map_batches(partial_topk, batch_format="pyarrow",
                          batch_size=8192).to_pandas()
    if df.empty:  # complete graph: every wedge pair is an edge
        df = pd.DataFrame({"pk": pd.Series([], dtype="int64"),
                           "score_nano": pd.Series([], dtype="int64"),
                           "n_common": pd.Series([], dtype="int64")})
    df = df.sort_values(["score_nano", "pk"],
                        ascending=[False, True]).head(K)
    pk = df["pk"].to_numpy(dtype=np.int64)
    return pa.table({
        "item_a": pa.array(pk >> np.int64(31), pa.int64()),
        "item_b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64()),
        "n_common": pa.array(df["n_common"].to_numpy(dtype=np.int64),
                             pa.int64()),
        "score_nano": pa.array(df["score_nano"].to_numpy(dtype=np.int64),
                               pa.int64())})


def _daily_rev_cents(sf_dir: str):
    """Daily order revenue in exact cents: per-batch combiner partials
    → one Sum groupby; one row per calendar day (driver-small by
    construction — years of data is thousands of rows)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import ts_us

    def partial(batch: pa.Table) -> pa.Table:
        day = pa.array(ts_us(batch.column("o_orderdate"))
                       // 86_400_000_000, pa.int64())
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"day": day, "rev_c": cents}).group_by(
            ["day"]).aggregate([("rev_c", "sum")])
        return pa.table({"day": g.column("day"),
                         "rev_c": pc.cast(g.column("rev_c_sum"),
                                          pa.int64())})

    return _read_pq(f"{sf_dir}/orders.parquet",
                    columns=["o_orderdate", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow").groupby("day").aggregate(
        Sum("rev_c", alias_name="rev_c"))


def q_revenue_trend_mk(sf_dir: str):
    """Non-parametric trend tests on the daily revenue series:
    Mann-Kendall S (sum over ordered day pairs of sign(Δrev) — exact
    integer) and the Theil-Sen slope (LOWER median of all pairwise
    slopes, the quantile_disc(0.5) rule DuckDB uses, slopes as
    CAST(Δcents AS DOUBLE)/Δdays in both engines). The heavy part —
    the daily aggregate — is distributed; the O(days²) pair pass runs
    on the driver because the series is CALENDAR-bounded (a decade is
    ~3.6k rows → 13M numpy pairs), not data-scale."""
    import numpy as np
    import pandas as pd

    d = _daily_rev_cents(sf_dir).to_pandas().sort_values(
        "day").reset_index(drop=True)
    day = d["day"].to_numpy(dtype=np.int64)
    rev = d["rev_c"].to_numpy(dtype=np.int64)
    n = len(day)
    iu, ju = np.triu_indices(n, k=1)
    dy = rev[ju] - rev[iu]
    dx = day[ju] - day[iu]
    s_stat = int(np.sign(dy).sum())
    slopes = np.sort(dy.astype(np.float64) / dx)
    med = float(slopes[(len(slopes) - 1) // 2]) if len(slopes) else None
    return pd.DataFrame({"n_days": [n], "n_pairs": [len(dy)],
                         "s_stat": [s_stat], "theil_sen": [med]})


def q_revenue_ewma(sf_dir: str):
    """Exponentially weighted moving average (alpha=0.2) over the daily
    revenue series, via the exact recurrence s_t = 0.2·x_t + 0.8·s_{t-1}
    (s_0 = x_0) — the same C-double operation order the SQL twin's
    RECURSIVE CTE executes, so the floats match bit-for-bit. Daily
    aggregate distributed; the recurrence is inherently sequential and
    runs over the calendar-bounded series on the driver."""
    import numpy as np
    import pandas as pd

    d = _daily_rev_cents(sf_dir).to_pandas().sort_values(
        "day").reset_index(drop=True)
    rev = d["rev_c"].to_numpy(dtype=np.int64)
    out = np.empty(len(rev), dtype=np.float64)
    e = None
    for i, x in enumerate(rev):
        e = float(x) if e is None else 0.2 * float(x) + 0.8 * e
        out[i] = e
    return pd.DataFrame({"day": d["day"].astype("int64"),
                         "rev_c": d["rev_c"].astype("int64"),
                         "ewma": out})


def q_event_trigrams(sf_dir: str):
    """Second-order sequence mining: counts of CONSECUTIVE event-type
    triples per user (ts, event_id order) — the Markov-2 analog of
    event_transitions: two vectorized shifts + a boundary mask per
    hash partition, partial counts combine in a |types|³-bounded
    shuffle. SQL twin is the identical double-LEAD window."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, ts_us)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "ts_us": pa.array(ts_us(batch.column("ts")), pa.int64()),
            "event_id": pc.cast(batch.column("event_id"), pa.int64()),
            "event_type": batch.column("event_type")})

    def trigrams(t: pa.Table) -> pa.Table:
        n = len(t)
        empty = pa.table({"t1": pa.array([], pa.string()),
                          "t2": pa.array([], pa.string()),
                          "t3": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if n < 3:
            return empty
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        same = (u[2:] == u[:-2])  # same user across the whole triple
        et = t.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        mask = pa.array(same)
        tri = pa.table({"t1": et.slice(0, n - 2).filter(mask),
                        "t2": et.slice(1, n - 2).filter(mask),
                        "t3": et.slice(2, n - 2).filter(mask)})
        g = tri.group_by(["t1", "t2", "t3"]).aggregate(
            [([], "count_all")])
        return pa.table({"t1": g.column("t1"), "t2": g.column("t2"),
                         "t3": g.column("t3"),
                         "n": pc.cast(g.column("count_all"), pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", trigrams,
                             sort_cols=["ts_us", "event_id"]
                             ).groupby(["t1", "t2", "t3"]).aggregate(
        Sum("n", alias_name="n")).to_pandas()
    return out.sort_values(["t1", "t2", "t3"]).reset_index(drop=True)


def q_ltv_cohort_curve(sf_dir: str):
    """Cohort LTV curve: users cohorted by FIRST-SEEN week; per
    (cohort_week, age_week) exact-cent purchase revenue plus the
    running cumulative along age. ONE per-user partition pass computes
    the first-seen week AND the per-age purchase sums (no separate
    first-week join); the (cohort × age) cell grid is CALENDAR-bounded,
    so the age cumsum runs on the driver."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, ts_us)

    WEEK_US = 604_800_000_000

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "week": pa.array(ts_us(batch.column("ts")) // WEEK_US,
                             pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                batch.column("value"), 100)), pa.int64()),
            "is_p": pc.cast(pc.equal(batch.column("event_type"),
                                     "purchase"), pa.int64())})

    def cells(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table({"cohort_week": pa.array([], pa.int64()),
                             "age_week": pa.array([], pa.int64()),
                             "rev_c": pa.array([], pa.int64())})
        wk = t.column("week").to_numpy(zero_copy_only=False)
        cents = t.column("cents").to_numpy(zero_copy_only=False)
        isp = t.column("is_p").to_numpy(
            zero_copy_only=False).astype(bool)
        starts = segment_starts(u)
        seg = np.searchsorted(starts, np.arange(len(u)), side="right") - 1
        fw = wk[starts][seg]  # rows sorted by (user, week): first week
        m = isp
        g = pa.table({"cohort_week": pa.array(fw[m], pa.int64()),
                      "age_week": pa.array(wk[m] - fw[m], pa.int64()),
                      "rev_c": pa.array(cents[m], pa.int64())}
                     ).group_by(["cohort_week", "age_week"]).aggregate(
            [("rev_c", "sum")])
        return pa.table({"cohort_week": g.column("cohort_week"),
                         "age_week": g.column("age_week"),
                         "rev_c": pc.cast(g.column("rev_c_sum"),
                                          pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type", "value"]
                  ).map_batches(prep, batch_format="pyarrow")
    cell = map_key_partitions(ev, "user_id", cells,
                              sort_cols=["week"]
                              ).groupby(["cohort_week", "age_week"]
                                        ).aggregate(
        Sum("rev_c", alias_name="rev_c")).to_pandas()
    cell = cell.sort_values(["cohort_week", "age_week"]
                            ).reset_index(drop=True)
    cell["cum_rev_c"] = cell.groupby("cohort_week")["rev_c"].cumsum(
    ).astype("int64")
    return cell


def q_lang_chars_moments(sf_dir: str):
    """Grouped higher moments (skewness + excess kurtosis of doc length
    per lang) from EXACT integer sufficient statistics: Σc³ and Σc⁴
    overflow int64, so each is carried as SPLIT int64 pieces via
    c² = a·2²⁰ + b (c³ = a·2²⁰·c + b·c; c⁴ = a²·2⁴⁰ + 2ab·2²⁰ + b²) —
    every piece sums safely in int64 through one tiny groupby, and the
    driver recombines them in arbitrary-precision Python ints. The SQL
    twin sums in HUGEINT and both sides evaluate the identical
    double-precision moment formula. Guard: raises if any doc exceeds
    2²¹ chars (the per-piece bound)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    PIECES = ("n", "s1", "s2", "s3ac", "s3bc", "s4a2", "s4ab", "s4b2")

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if len(c) and c.max() >= (1 << 21):
            raise ValueError("split-int64 moment pieces require "
                             "n_chars < 2^21")
        c2 = c * c
        a, b = c2 >> 20, c2 & ((1 << 20) - 1)
        return pa.table({
            "lang": batch.column("lang"),
            "n": pa.array(np.ones(len(c), np.int64)),
            "s1": pa.array(c), "s2": pa.array(c2),
            "s3ac": pa.array(a * c), "s3bc": pa.array(b * c),
            "s4a2": pa.array(a * a), "s4ab": pa.array(a * b),
            "s4b2": pa.array(b * b),
        }).group_by(["lang"]).aggregate(
            [(p, "sum") for p in PIECES]).rename_columns(
            ["lang", *PIECES])

    agg = _read_pq(f"{sf_dir}/documents.parquet",
                   columns=["lang", "n_chars"]).map_batches(
        partial, batch_format="pyarrow").groupby("lang").aggregate(
        *[Sum(p, alias_name=p) for p in PIECES]).to_pandas()

    rows = []
    for r in agg.itertuples():
        n = int(r.n)
        s1, s2 = int(r.s1), int(r.s2)
        s3 = (int(r.s3ac) << 20) + int(r.s3bc)
        s4 = (int(r.s4a2) << 40) + (int(r.s4ab) << 21) + int(r.s4b2)
        # mirror the oracle's double arithmetic shape exactly
        mean = float(s1) / n
        r2, r3, r4 = float(s2) / n, float(s3) / n, float(s4) / n
        m2 = r2 - mean * mean
        m3 = r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean
        m4 = (r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2
              - 3.0 * mean * mean * mean * mean)
        rows.append({"lang": r.lang, "n_docs": n, "mean_chars": mean,
                     "var_chars": m2,
                     "skew_chars": m3 / (math.sqrt(m2) * m2),
                     "kurt_chars": m4 / (m2 * m2) - 3.0})
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


def q_degree_assortativity(sf_dir: str):
    """Degree assortativity of the co-view item graph (Pearson r of
    endpoint degrees over DIRECTED edges) — the standard Newman mixing
    coefficient. Two keyed passes, both LINEAR in edges (no pair
    expansion, so no hub cap needed): partition by node gives
    deg(node) as the segment length and emits (nbr, deg_src) per edge;
    partition by nbr gives deg(nbr) the same way and reduces each
    partition to ONE exact int64 sufficient-stats row. The driver
    mirrors the oracle's double formula (lineitem_corr shape)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    MIN_USERS = 2
    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    def emit_src_deg(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        if not len(node):
            return pa.table({"nbr": pa.array([], pa.int64()),
                             "deg_src": pa.array([], pa.int64())})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        return pa.table({
            "nbr": pa.array(nbr, pa.int64()),
            "deg_src": pa.array(np.repeat(lens, lens), pa.int64())})

    def stats_partial(t: pa.Table) -> pa.Table:
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        x = t.column("deg_src").to_numpy(zero_copy_only=False)
        if not len(nbr):
            z = pa.array([], pa.int64())
            return pa.table({c: z for c in
                             ("n", "sx", "sy", "sxx", "syy", "sxy")})
        starts = segment_starts(nbr)
        lens = segment_lengths(starts, len(nbr))
        y = np.repeat(lens, lens)
        return pa.table({
            "n": pa.array([len(nbr)], pa.int64()),
            "sx": pa.array([int(x.sum())], pa.int64()),
            "sy": pa.array([int(y.sum())], pa.int64()),
            "sxx": pa.array([int((x * x).sum())], pa.int64()),
            "syy": pa.array([int((y * y).sum())], pa.int64()),
            "sxy": pa.array([int((x * y).sum())], pa.int64())})

    adj = edges.map_batches(symmetrize, batch_format="pyarrow")
    deg_rows = map_key_partitions(adj, "node", emit_src_deg,
                                  sort_cols=["nbr"])
    st = map_key_partitions(deg_rows, "nbr", stats_partial).aggregate(
        *[Sum(c, alias_name=c) for c in
          ("n", "sx", "sy", "sxx", "syy", "sxy")])
    n, sx, sy = st["n"], st["sx"], st["sy"]
    sxx, syy, sxy = st["sxx"], st["syy"], st["sxy"]
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt((float(n) * float(sxx) - float(sx) * float(sx))
                    * (float(n) * float(syy) - float(sy) * float(sy)))
    # a REGULAR graph (every degree equal — e.g. complete) has zero
    # degree variance: assortativity is undefined; DuckDB yields NULL
    # on /0, so mirror with None (caught by the sf1 complete graph)
    r = num / den if den != 0.0 else None
    return pd.DataFrame({"n_edges": [int(n) // 2],
                         "assortativity": [r]})


def q_scd2_history(sf_dir: str):
    """SCD TYPE-2 history build: each user's purchase stream (ts,
    event_id order) is a change stream of their "current item";
    consecutive repeats COALESCE (true SCD-2, not one row per event)
    and each change opens a validity interval [valid_from_us,
    valid_to_us) closed by the next change (-1 sentinel = still open
    — NULLs would force a lossy float path through the compare).
    One per-user partition pass: change mask + shifted next-change
    lookup, all vectorized. SQL twin: LAG change flag + LEAD close."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, ts_us)

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"),
                                  "purchase"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        item = pc.cast(pc.struct_field(pc.extract_regex(
            col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "t": pa.array(ts_us(t.column("ts")), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "item": item})

    def intervals(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "item": pa.array([], pa.int64()),
                          "valid_from_us": pa.array([], pa.int64()),
                          "valid_to_us": pa.array([], pa.int64())})
        if not len(u):
            return empty
        it = t.column("item").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        change = np.r_[True, (u[1:] != u[:-1]) | (it[1:] != it[:-1])]
        idx = np.flatnonzero(change)
        cu, cit, cfrom = u[idx], it[idx], ts[idx]
        cto = np.full(len(idx), -1, dtype=np.int64)
        if len(idx) > 1:
            same = cu[1:] == cu[:-1]
            cto[:-1] = np.where(same, cfrom[1:], -1)
        return pa.table({"user_id": pa.array(cu, pa.int64()),
                         "item": pa.array(cit, pa.int64()),
                         "valid_from_us": pa.array(cfrom, pa.int64()),
                         "valid_to_us": pa.array(cto, pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type",
                           "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", intervals,
                             sort_cols=["t", "event_id"]).to_pandas()
    return out.sort_values(["user_id", "valid_from_us"]
                           ).reset_index(drop=True)


def q_event_rle(sf_dir: str):
    """Run-length compaction of per-user event-type sequences (session
    replay compression): per user the run count, longest run, and the
    floor-ppm compression ratio n_runs/n_events. One per-user partition
    pass (change mask + reduceat); |users| output rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "t": pa.array(ts_us(batch.column("ts")), pa.int64()),
            "event_id": pc.cast(batch.column("event_id"), pa.int64()),
            "event_type": batch.column("event_type")})

    def rle(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "n_runs": pa.array([], pa.int64()),
                             "longest_run": pa.array([], pa.int64()),
                             "ratio_ppm": pa.array([], pa.int64())})
        codes = pc.dictionary_encode(
            t.column("event_type").combine_chunks()).indices.to_numpy(
            zero_copy_only=False)
        run_start = np.r_[True, (u[1:] != u[:-1])
                          | (codes[1:] != codes[:-1])]
        rs = np.flatnonzero(run_start)
        rlen = segment_lengths(rs, len(u))
        ustarts = segment_starts(u)
        ulen = segment_lengths(ustarts, len(u))
        # runs per user: count of run starts inside each user segment
        runs_per_user = np.add.reduceat(
            run_start.astype(np.int64), ustarts)
        # longest run per user: max rlen over each user's runs
        run_user_start = np.searchsorted(rs, ustarts)
        longest = np.maximum.reduceat(rlen, run_user_start)
        ratio = (1_000_000 * runs_per_user) // ulen
        return pa.table({
            "user_id": pa.array(u[ustarts], pa.int64()),
            "n_events": pa.array(ulen, pa.int64()),
            "n_runs": pa.array(runs_per_user, pa.int64()),
            "longest_run": pa.array(longest, pa.int64()),
            "ratio_ppm": pa.array(ratio, pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", rle,
                             sort_cols=["t", "event_id"]).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_media_dimensions(sf_dir: str):
    """Metadata extraction from REAL image bytes with an INDEPENDENT
    oracle: one deterministic image ref per document → fetch_media_stub
    synthesizes real PNG payloads (dims seeded from md5(ref)) → this
    stage parses the IHDR chunk of the actual BYTES (not the carried
    width column). The SQL twin re-derives the expected dims from
    md5(ref) — so a decode that misreads the header fails the hash.
    bit_depth/color_type pin the codec contract (8-bit RGB)."""
    import struct

    import pyarrow as pa

    from magic_content_extractor_ray.stages.multimodal import (
        fetch_media_stub)

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": pa.array(
                [f"https://media.example/{i}/img-0.png" for i in ids],
                pa.string()),
            "kind": pa.array(["image"] * len(ids), pa.string())})

    def fetch(batch: pa.Table) -> pa.Table:
        media = fetch_media_stub(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "media_ref": media.column("media_ref"),
                         "payload": media.column("payload")})

    def ihdr(batch: pa.Table) -> pa.Table:
        ws, hs, depths, colors = [], [], [], []
        for p in batch.column("payload").to_pylist():
            if p[12:16] != b"IHDR":
                raise ValueError("payload is not an IHDR-first PNG")
            w, h, depth, color = struct.unpack(">IIBB", p[16:26])
            ws.append(w)
            hs.append(h)
            depths.append(depth)
            colors.append(color)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "width": pa.array(ws, pa.int64()),
            "height": pa.array(hs, pa.int64()),
            "bit_depth": pa.array(depths, pa.int64()),
            "color_type": pa.array(colors, pa.int64())})

    out = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"]
                   ).map_batches(to_refs, batch_format="pyarrow"
                                 ).map_batches(
        fetch, batch_format="pyarrow", batch_size=256
    ).map_batches(ihdr, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_zonemap_prune(sf_dir: str):
    """Zone-map pruning via a PAY-ONCE sorted layout: orders are
    range-sorted by day and persisted with SMALL row groups (one
    global sort at layout-build time, amortized over every later
    read, the smb_join_revenue precedent); a point-range query then
    reads with a pushed pyarrow filter, so non-matching fragments
    cost a footer read only — the row-group min/max stats (zone maps)
    skip their data pages. Query: March-1998 order counts + exact
    revenue by priority; the SQL twin filters the base table."""
    import datetime as dt
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pds
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import ts_us

    base = f"/tmp/mce_zone_{os.path.basename(os.path.normpath(sf_dir))}"
    data = f"{base}/data"
    if not os.path.exists(f"{base}/_DONE"):
        if os.path.exists(base):
            shutil.rmtree(base)

        def prep(t: pa.Table) -> pa.Table:
            return pa.table({
                "day": pa.array(ts_us(t.column("o_orderdate"))
                                // 86_400_000_000, pa.int64()),
                "priority": t.column("o_orderpriority"),
                "cents": pc.cast(pc.round(pc.multiply(
                    t.column("o_totalprice"), 100)), pa.int64())})

        _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_orderdate", "o_orderpriority",
                          "o_totalprice"]
                 ).map_batches(prep, batch_format="pyarrow").sort(
            "day").write_parquet(data, row_group_size=2048)
        with open(f"{base}/_DONE", "w") as f:
            f.write("ok")

    epoch = dt.datetime(1970, 1, 1)
    lo = (dt.datetime(1998, 3, 1) - epoch).days
    hi = (dt.datetime(1998, 4, 1) - epoch).days
    import ray.data as rd

    pruned = rd.read_parquet(
        data, filter=(pds.field("day") >= lo) & (pds.field("day") < hi))

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        g = pa.table({"priority": t.column("priority"),
                      "n": pa.array(np.ones(len(t), np.int64)),
                      "cents": t.column("cents")}).group_by(
            "priority").aggregate([("n", "sum"), ("cents", "sum")])
        return g.rename_columns(["priority", "n_orders",
                                 "revenue_cents"])

    out = pruned.map_batches(partial, batch_format="pyarrow").groupby(
        "priority").aggregate(
        Sum("n_orders", alias_name="n_orders"),
        Sum("revenue_cents", alias_name="revenue_cents")).to_pandas()
    return out.sort_values("priority").reset_index(drop=True)


def q_funnel_1h(sf_dir: str):
    """WINDOWED funnel (vs funnel_counts' whole-history ordering): a
    purchase converts iff some click precedes it within 1 h AND that
    click itself follows a view within 1 h. Per-user partition pass
    with the event_bursts composite-key trick — one searchsorted over
    (segment × padded-span + ts) keys answers every per-user window
    probe at once (no per-user Python loop); OK-click membership
    turns into a prefix-sum range count. Output: per purchasing user,
    total vs funnel-attributed purchases."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    H = 3_600_000_000  # 1 h in microseconds

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["view", "click",
                                            "purchase"]))
        t = batch.filter(mask)
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "t": pa.array(ts_us(t.column("ts")), pa.int64()),
            "event_type": t.column("event_type")})

    def funnel(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_purchases": pa.array([], pa.int64()),
                          "n_attributed": pa.array([], pa.int64())})
        if not len(u):
            return empty
        ts = t.column("t").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        starts = segment_starts(u)
        seg = np.searchsorted(starts, np.arange(len(u)),
                              side="right") - 1
        base = ts - ts.min()
        span = int(base.max()) + 2 * H + 2
        if len(starts) * span >= (1 << 62):
            raise ValueError("composite funnel key would overflow "
                             "int64; raise num_buckets")
        k = seg.astype(np.int64) * span + base + H  # +H pads k-H probes
        kv = k[et == "view"]
        kc = k[et == "click"]
        is_p = et == "purchase"
        kp = k[is_p]
        if not len(kp):
            return empty
        ok = (np.searchsorted(kv, kc - H, side="left")
              < np.searchsorted(kv, kc, side="left")).astype(np.int64)
        s = np.concatenate(([0], np.cumsum(ok)))
        lo = np.searchsorted(kc, kp - H, side="left")
        hi = np.searchsorted(kc, kp, side="left")
        attributed = (s[hi] - s[lo]) > 0
        pu = u[is_p]
        pstarts = segment_starts(pu)
        plens = segment_lengths(pstarts, len(pu))
        n_attr = np.add.reduceat(attributed.astype(np.int64), pstarts)
        return pa.table({
            "user_id": pa.array(pu[pstarts], pa.int64()),
            "n_purchases": pa.array(plens, pa.int64()),
            "n_attributed": pa.array(n_attr, pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", funnel,
                             sort_cols=["t"]).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_kcore_items(sf_dir: str):
    """Distributed K-CORE decomposition (k=5) of the co-view item
    graph: iterative edge peeling — each round two LINEAR keyed passes
    (partition by node → deg(node) rides each edge; partition by nbr →
    deg(nbr) is the segment length) drop every edge with an endpoint
    below k; rounds materialize like item_bfs/k-means and stop at the
    fixpoint (count unchanged). The k-core is UNIQUE, so any peeling
    order converges to the same set — the SQL twin's recursive CTE
    peels in lockstep rounds and must agree exactly. Bounded at 64
    rounds with a loud failure (real peel depths are far smaller;
    each round strictly shrinks the edge set)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    K = 5
    MAX_ROUNDS = 64
    MIN_USERS = 2

    def unpack(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(pk >> np.int64(31), pa.int64()),
            "b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64())})

    def symmetrize(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    def emit_deg(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        if not len(node):
            return pa.table({"node": pa.array([], pa.int64()),
                             "nbr": pa.array([], pa.int64()),
                             "deg_src": pa.array([], pa.int64())})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "nbr": pa.array(nbr, pa.int64()),
            "deg_src": pa.array(np.repeat(lens, lens), pa.int64())})

    def filter_k(t: pa.Table) -> pa.Table:
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if not len(nbr):
            return empty
        node = t.column("node").to_numpy(zero_copy_only=False)
        ds_ = t.column("deg_src").to_numpy(zero_copy_only=False)
        starts = segment_starts(nbr)
        lens = segment_lengths(starts, len(nbr))
        deg_nbr = np.repeat(lens, lens)
        keep = (ds_ >= K) & (deg_nbr >= K) & (node < nbr)
        return pa.table({"a": pa.array(node[keep], pa.int64()),
                         "b": pa.array(nbr[keep], pa.int64())})

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS).map_batches(
        unpack, batch_format="pyarrow").materialize()
    cnt = edges.count()
    for _ in range(MAX_ROUNDS):
        if cnt == 0:
            return pd.DataFrame({"item": pd.Series([], dtype="int64"),
                                 "core_degree": pd.Series(
                                     [], dtype="int64")})
        adj = edges.map_batches(symmetrize, batch_format="pyarrow")
        deg_rows = map_key_partitions(adj, "node", emit_deg,
                                      sort_cols=["nbr"])
        surv = map_key_partitions(deg_rows, "nbr",
                                  filter_k).materialize()
        new_cnt = surv.count()
        if new_cnt == cnt:
            break
        edges, cnt = surv, new_cnt
    else:
        raise RuntimeError(f"k-core did not converge in {MAX_ROUNDS} "
                           "rounds")

    def final_deg(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        if not len(node):
            return pa.table({"item": pa.array([], pa.int64()),
                             "core_degree": pa.array([], pa.int64())})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        return pa.table({"item": pa.array(node[starts], pa.int64()),
                         "core_degree": pa.array(lens, pa.int64())})

    out = map_key_partitions(
        edges.map_batches(symmetrize, batch_format="pyarrow"),
        "node", final_deg).to_pandas()
    return out.sort_values("item").reset_index(drop=True)


def q_mutual_nn(sf_dir: str):
    """Mutual-nearest-neighbor pairs (the dataset-alignment / MNN
    dedup primitive): vectors a, b pair iff each is the other's
    cosine top-1 (self excluded, ties to the smaller vec_id). The
    corpus streams in batches against a BROADCAST normalized matrix
    (ray.put once, fetched per actor) — each vector's top-1 is
    decided in the one batch that carries it, so there is NO
    cross-batch merge; mutuality is then one hash_agg over packed
    pair keys (mutual ⟺ the unordered pair appears twice). Top-1
    comes from stages/ann.knn_edges: exact float64 broadcast at
    oracle scale (≤4096 rows — rank-level agreement with DuckDB's
    double list_cosine_similarity, the ann_topk convention) and the
    IVF-bucketed exchange above it, which ships each vector to only
    its nprobe probe lists (no corpus broadcast) and self-asserts
    sampled recall ≥ 0.9 vs exact brute force in the same run."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from magic_content_extractor_ray.stages.ann import knn_edges
    from magic_content_extractor_ray.stages.window import hash_agg

    n_rows = pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet").metadata.num_rows
    edges = knn_edges(
        _read_pq(f"{sf_dir}/embeddings.parquet",
                 columns=["vec_id", "embedding"]),
        k=1, n_rows=n_rows)

    def to_pk(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        nbr = t.column("t").to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(s, nbr), np.maximum(s, nbr)
        if len(lo) and (lo.min() < 0 or hi.max() >= (1 << 31)):
            raise ValueError("mutual_nn packs pairs into int64; "
                             "vec_ids must be in [0, 2^31)")
        return pa.table({
            "pk": pa.array((lo << np.int64(31)) | hi, pa.int64()),
            "c": pa.array(np.ones(len(lo), np.int64), pa.int64())})

    top1 = edges.map_batches(to_pk, batch_format="pyarrow")
    mutual = hash_agg(top1, "pk", [("c", "sum", "n")]).filter(
        lambda r: r["n"] == 2).to_pandas()
    pk = np.sort(mutual["pk"].to_numpy(dtype=np.int64))
    return pd.DataFrame({
        "vec_a": pd.Series(pk >> np.int64(31), dtype="int64"),
        "vec_b": pd.Series(pk & np.int64((1 << 31) - 1),
                           dtype="int64")})


def q_monthly_seasonality(sf_dir: str):
    """Classical ratio-to-moving-average SEASONAL INDEX: monthly
    revenue over a centered 12-month window (ROWS 6 PRECEDING..5
    FOLLOWING, full windows only), index = floor-ppm rev/MA with the
    MA in half-away integer cents — all integer, so the SQL window
    twin matches bit-for-bit. Monthly aggregate distributed; the
    month series is calendar-bounded, so the window runs driver-side
    (the daily_revenue_ma7 precedent)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column("o_orderdate")
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        mb = pc.add(pc.multiply(pc.cast(pc.year(ts), pa.int64()), 12),
                    pc.subtract(pc.cast(pc.month(ts), pa.int64()), 1))
        cents = pc.cast(pc.round(pc.multiply(
            batch.column("o_totalprice"), 100)), pa.int64())
        g = pa.table({"month_bucket": mb, "rev_c": cents}).group_by(
            "month_bucket").aggregate([("rev_c", "sum")])
        return pa.table({"month_bucket": g.column("month_bucket"),
                         "rev_c": pc.cast(g.column("rev_c_sum"),
                                          pa.int64())})

    d = _read_pq(f"{sf_dir}/orders.parquet",
                 columns=["o_orderdate", "o_totalprice"]).map_batches(
        partial, batch_format="pyarrow").groupby(
        "month_bucket").aggregate(
        Sum("rev_c", alias_name="rev_c")).to_pandas().sort_values(
        "month_bucket").reset_index(drop=True)
    rev = d["rev_c"].to_numpy(dtype=np.int64)
    n = len(rev)
    cs = np.concatenate(([0], np.cumsum(rev)))
    idx = np.arange(n)
    lo, hi = idx - 6, idx + 5  # ROWS 6 PRECEDING .. 5 FOLLOWING
    full = (lo >= 0) & (hi <= n - 1)
    sums = cs[np.clip(hi, 0, n - 1) + 1] - cs[np.clip(lo, 0, n)]
    ma_c = (2 * sums + 12) // 24  # half-away integer cents, count=12
    out = pd.DataFrame({
        "month_bucket": d["month_bucket"].astype("int64"),
        "rev_c": d["rev_c"].astype("int64"),
        "ma12_c": ma_c.astype("int64"),
        "index_ppm": (1_000_000 * rev) // ma_c})
    return out[full].reset_index(drop=True)


def q_assoc_triples(sf_dir: str):
    """Apriori level-3: top-30 co-view item TRIPLES by user support.
    Per-user triples are generated fully vectorized — the existing
    triangular PAIR decode, then each pair (i, j) expands by the
    items ranked after j via one repeat/cumsum pass — and packed into
    one int64 (3 × 21-bit lanes, ids guarded < 2²¹), so the exchange
    is (pk, count) like covisitation. Per-user fan-out is C(d, 3);
    the hub cap here is TIGHTER than the pair cap (C(256,3) ≈ 2.7M
    rows per hub per task is the budget; the fixture's max degree is
    far below the cap, so capped == exact there, the covisitation
    convention). Tie-break (support desc, pk asc) == (n, ia, ib, ic)
    lexicographic because the pack is order-preserving."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_sum, map_key_partitions, segment_lengths, segment_starts)

    K = 30
    TRIPLE_CAP = 256

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ks = pc.cast(pc.struct_field(pc.extract_regex(
            col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": ks}).group_by(["user_id", "item"]).aggregate([])

    def triples(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        it = t.column("item").to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if not len(u):
            return empty
        if it.min() < 0 or it.max() >= (1 << 21):
            raise ValueError("triple pack needs item ids in [0, 2^21)")
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (it[1:] != it[:-1])
        u, it = _cap_user_items(u[keep], it[keep], cap=TRIPLE_CAP)
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        sel = lens >= 3
        starts, lens = starts[sel], lens[sel]
        if not len(starts):
            return empty
        # pair stage (triangular decode, the covisitation kernel)
        pcounts = lens * (lens - 1) // 2
        ptotal = int(pcounts.sum())
        seg = np.repeat(np.arange(len(lens)), pcounts)
        offs = np.concatenate(([0], np.cumsum(pcounts)[:-1]))
        tloc = np.arange(ptotal, dtype=np.int64) - np.repeat(offs,
                                                             pcounts)
        length = lens[seg]
        a = (length - 2 - np.floor(
            (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0)
             - 1.0) / 2.0)).astype(np.int64)
        b = tloc + a + 1 - length * (length - 1) // 2 \
            + (length - a) * (length - a - 1) // 2
        # expand each pair (a, b) by every item ranked after b
        c3 = length - 1 - b
        total3 = int(c3.sum())
        if total3 == 0:
            return empty
        rep = np.repeat(np.arange(ptotal), c3)
        offs3 = np.concatenate(([0], np.cumsum(c3)[:-1]))
        tloc3 = np.arange(total3, dtype=np.int64) - np.repeat(offs3, c3)
        base = starts[seg][rep]
        ia = it[base + a[rep]]
        ib = it[base + b[rep]]
        ic = it[base + b[rep] + 1 + tloc3]
        pk = (ia << np.int64(42)) | (ib << np.int64(21)) | ic
        pku, cnt = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(pku, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "event_type", "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    counts = hash_sum(
        map_key_partitions(ui, "user_id", triples, sort_cols=["item"]),
        "pk", "c", "n_users")

    def partial_topk(batch: pa.Table) -> pa.Table:
        return _batch_topk(batch, [("n_users", "descending"),
                                   ("pk", "ascending")], k=K)

    df = counts.map_batches(partial_topk, batch_format="pyarrow",
                            batch_size=8192).to_pandas()
    df = df.sort_values(["n_users", "pk"],
                        ascending=[False, True]).head(K)
    pk = df["pk"].to_numpy(dtype=np.int64)
    m21 = np.int64((1 << 21) - 1)
    return pd.DataFrame({
        "item_a": pd.Series(pk >> np.int64(42), dtype="int64"),
        "item_b": pd.Series((pk >> np.int64(21)) & m21, dtype="int64"),
        "item_c": pd.Series(pk & m21, dtype="int64"),
        "n_users": df["n_users"].astype("int64").to_numpy()})


def q_jaccard_histogram(sf_dir: str):
    """Dedup YIELD CURVE: how many near-dup pairs each Jaccard
    threshold would merge — the tuning artifact behind picking
    dedup_ngram's 0.4. One run of the exact inverted-index pipeline
    at floor threshold 0.1, then decile bins on the (already
    hash-stable) 6-dp jaccard: bin = floor(j·10), bin 10 = exact
    dups. Bounded output (≤10 rows); the pair volume dies inside the
    dedup pipeline's bucket tasks as usual."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.dedup import (
        ngram_jaccard_dedup)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    pairs = ngram_jaccard_dedup(docs, threshold=0.1, max_df=32)

    def binned(t: pa.Table) -> pa.Table:
        j = t.column("jaccard").to_numpy(zero_copy_only=False)
        b = np.floor(j * 10).astype(np.int64)
        bu, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(bu, pa.int64()),
                         "n_pairs": pa.array(cnt.astype(np.int64),
                                             pa.int64())})

    from ray.data.aggregate import Sum

    out = pairs.map_batches(binned, batch_format="pyarrow").groupby(
        "bin").aggregate(Sum("n_pairs", alias_name="n_pairs")
                         ).to_pandas()
    return out.sort_values("bin").reset_index(drop=True)


def q_survival_km(sf_dir: str):
    """KAPLAN-MEIER survival of view→purchase conversion: per user,
    duration = days from FIRST VIEW to the first purchase at/after it
    (event) or to their last event (right-censored). One per-user
    partition pass computes (duration, event) via masked reduceat
    minima; the (duration × flag) count grid is calendar-bounded, so
    risk sets and the running log-survival build on the driver. The
    curve is carried as INTEGER nano-nats — each step's
    ln(1 − d/n) is half-up rounded BEFORE the cumulative sum (the
    term_keyness/geo-mean convention), so both engines agree exactly;
    a step that empties the risk set (d = n) takes the −10¹⁵ sentinel
    instead of ln(0)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    DAY = 86_400_000_000
    BIG = np.int64(1 << 62)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "t": pa.array(ts_us(batch.column("ts")), pa.int64()),
            "event_type": batch.column("event_type")})

    def durations(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        empty = pa.table({"d": pa.array([], pa.int64()),
                          "ev": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if not len(u):
            return empty
        ts = t.column("t").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        starts = segment_starts(u)
        lens = segment_lengths(starts, len(u))
        seg = np.searchsorted(starts, np.arange(len(u)),
                              side="right") - 1
        tv = np.minimum.reduceat(
            np.where(et == "view", ts, BIG), starts)
        has_view = tv < BIG
        tv_rep = tv[seg]
        tp = np.minimum.reduceat(
            np.where((et == "purchase") & (ts >= tv_rep), ts, BIG),
            starts)
        tl = np.maximum.reduceat(ts, starts)
        ev = (tp < BIG) & has_view
        end = np.where(ev, tp, tl)
        d = (end - tv) // DAY
        g = pa.table({"d": pa.array(d[has_view], pa.int64()),
                      "ev": pa.array(ev[has_view].astype(np.int64),
                                     pa.int64())}).group_by(
            ["d", "ev"]).aggregate([([], "count_all")])
        return pa.table({"d": g.column("d"), "ev": g.column("ev"),
                         "n": pc.cast(g.column("count_all"),
                                      pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type"]
                  ).map_batches(prep, batch_format="pyarrow")
    grid = map_key_partitions(ev, "user_id", durations,
                              sort_cols=["t"]).groupby(
        ["d", "ev"]).aggregate(Sum("n", alias_name="n")).to_pandas()

    total = int(grid["n"].sum())
    by_d = grid.groupby("d")["n"].sum().sort_index()
    events = grid[grid["ev"] == 1].set_index("d")["n"].sort_index()
    # n_risk at t = users with duration >= t
    durs = by_d.index.to_numpy(dtype=np.int64)
    cum_below = np.concatenate(([0], np.cumsum(
        by_d.to_numpy(dtype=np.int64))))
    rows, km = [], 0
    for t_days, n_ev in events.items():
        n_risk = total - int(cum_below[np.searchsorted(durs, t_days)])
        if int(n_ev) == n_risk:
            term = -1_000_000_000_000_000
        else:
            term = int(math.floor(
                math.log(1.0 - float(int(n_ev)) / n_risk) * 1e9 + 0.5))
        km += term
        rows.append({"t_days": int(t_days), "n_risk": n_risk,
                     "n_events": int(n_ev), "log_surv_nano": km})
    return pd.DataFrame(rows, columns=["t_days", "n_risk", "n_events",
                                       "log_surv_nano"]).astype(
        {"t_days": "int64", "n_risk": "int64", "n_events": "int64",
         "log_surv_nano": "int64"})


def q_late_events(sf_dir: str):
    """Streaming WATERMARK audit: an event is LATE if its timestamp
    is > 1 h behind the running max timestamp over arrival order
    (event_id) — the out-of-orderness measure that sizes a streaming
    pipeline's allowed lateness. The running max is a distributed
    ordered MAX-SCAN (the keyed_prefix_sum two-phase shape, max
    instead of sum): per-batch per-bucket maxima → driver exclusive
    prefix-max over the BOUNDED bucket axis, broadcast → one shuffle
    co-locates each bucket, intra-bucket exclusive cummax finishes
    exactly. Output: per event-day totals and late counts."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts, ts_us)

    WIDTH = 100_000
    LATE_US = 3_600_000_000
    DAY = 86_400_000_000
    NEG = -(1 << 62)

    def prep(batch: pa.Table) -> pa.Table:
        eid = pc.cast(batch.column("event_id"), pa.int64())
        return pa.table({
            "bucket": pc.divide(eid, WIDTH),
            "event_id": eid,
            "t": pa.array(ts_us(batch.column("ts")), pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["event_id", "ts"]).map_batches(
        prep, batch_format="pyarrow").materialize()  # consumed twice

    def bucket_max(batch: pa.Table) -> pa.Table:
        g = batch.group_by("bucket").aggregate([("t", "max")])
        return g.rename_columns(["bucket", "tmax"])

    bm = ev.map_batches(bucket_max, batch_format="pyarrow").to_pandas()
    bm = bm.groupby("bucket")["tmax"].max().sort_index()
    bids = bm.index.to_numpy(dtype=np.int64)
    # exclusive prefix-max across buckets (bounded axis, driver-side)
    pmax = np.concatenate(([NEG], np.maximum.accumulate(
        bm.to_numpy(dtype=np.int64))[:-1]))
    ref = ray.put((bids, pmax))

    def lateness(t: pa.Table) -> pa.Table:
        empty = pa.table({"day": pa.array([], pa.int64()),
                          "n_events": pa.array([], pa.int64()),
                          "n_late": pa.array([], pa.int64())})
        if not len(t):
            return empty
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        ts = t.column("t").to_numpy(zero_copy_only=False)
        bids_, pmax_ = ray.get(ref)
        starts = segment_starts(b)
        # per-bucket exclusive cummax seeded with the cross-bucket
        # prefix max; the loop is over BUCKETS in this partition
        # (bounded by event_id range / WIDTH), not rows
        wm = np.empty_like(ts)
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(ts)
            base = pmax_[np.searchsorted(bids_, b[s])]
            wm[s] = base
            if e - s > 1:
                wm[s + 1:e] = np.maximum(
                    np.maximum.accumulate(ts[s:e - 1]), base)
        late = (wm != NEG) & (ts < wm - LATE_US)
        g = pa.table({"day": pa.array(ts // DAY, pa.int64()),
                      "n_events": pa.array(np.ones(len(ts), np.int64)),
                      "n_late": pa.array(late.astype(np.int64),
                                         pa.int64())}).group_by(
            "day").aggregate([("n_events", "sum"), ("n_late", "sum")])
        return g.rename_columns(["day", "n_events", "n_late"])

    out = map_key_partitions(ev, "bucket", lateness,
                             sort_cols=["event_id"]).groupby(
        "day").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("n_late", alias_name="n_late")).to_pandas()
    return out.sort_values("day").reset_index(drop=True)


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


def q_title_entity_clusters(sf_dir: str):
    """ENTITY RESOLUTION end-to-end with an INDEPENDENT oracle (the
    LSH dedup clusterings are snapshot-pinned; this one is not):
    edit-distance-1 title pairs (SymSpell deletion blocking, complete)
    → connected components by MIN-LABEL propagation over the STRING
    keys — per round one keyed exchange attaches each endpoint's
    current label to its neighbors and a hash_agg min re-labels;
    convergence is a tagged-union changed-row count; bounded at 64
    rounds (≥ component diameter; edit-1 title chains longer than
    that are pathological) with a loud failure. Survivorship: the
    lexicographic MIN member is the canonical record. The SQL twin
    re-derives pairs by brute-force levenshtein and runs the same
    propagation as a recursive CTE."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.fuzzy import edit1_join
    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions)

    def titles(batch: pa.Table) -> pa.Table:
        t = pc.utf8_lower(pc.utf8_slice_codeunits(
            batch.column("text"), 0, 12))
        return pa.table({"title": t.filter(pc.not_equal(t, ""))})

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["text"]).map_batches(
        titles, batch_format="pyarrow")
    pairs = edit1_join(ds, "title").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays([t.column("left").combine_chunks(),
                                 t.column("right").combine_chunks()])
        g = pa.table({"node": vals}).group_by("node").aggregate(
            [([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "label": g.column("node")})

    labels = hash_agg(
        pairs.map_batches(init_labels, batch_format="pyarrow"),
        "node", [("label", "min", "label")]).materialize()

    def edge_rows(t: pa.Table) -> pa.Table:
        l = t.column("left").combine_chunks()
        r = t.column("right").combine_chunks()
        return pa.table({
            "node": pa.concat_arrays([l, r]),
            "other": pa.concat_arrays([r, l]),
            "label": pa.nulls(2 * len(t), pa.string())})

    for _ in range(64):
        tagged = labels.map_batches(
            lambda t: pa.table({"node": t.column("node"),
                                "other": pa.nulls(len(t), pa.string()),
                                "label": t.column("label")}),
            batch_format="pyarrow").union(
            pairs.map_batches(edge_rows, batch_format="pyarrow"))

        def propagate(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False)
            other = t.column("other").to_numpy(zero_copy_only=False)
            lab = t.column("label").to_numpy(zero_copy_only=False)
            if not len(node):
                return pa.table({"node": pa.array([], pa.string()),
                                 "label": pa.array([], pa.string())})
            # rows sorted by node; each node's single label row
            # (other is null) seeds its segment
            from magic_content_extractor_ray.stages.window import (
                segment_lengths, segment_starts)

            is_lab = pd.isna(other)
            starts = segment_starts(node)
            seg = np.searchsorted(starts, np.arange(len(node)),
                                  side="right") - 1
            seg_label = np.empty(len(starts), dtype=object)
            seg_label[seg[is_lab]] = lab[is_lab]
            out_n, out_l = [node[starts]], [seg_label]
            em = ~is_lab
            if em.any():
                out_n.append(other[em])
                out_l.append(seg_label[seg[em]])
            return pa.table({
                "node": pa.array(np.concatenate(out_n), pa.string()),
                "label": pa.array(np.concatenate(out_l), pa.string())})

        new_labels = hash_agg(
            map_key_partitions(tagged, "node", propagate),
            "node", [("label", "min", "label")]).materialize()
        # convergence: any (node, label) row not present twice changed
        changed = hash_agg(
            labels.union(new_labels).map_batches(
                lambda t: t.append_column("one", pa.array(
                    np.ones(len(t), np.int64))),
                batch_format="pyarrow"),
            "node", [("one", "sum", "n")],
            group_cols=["node", "label"]).filter(
            lambda r: r["n"] == 1).count()
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError("label propagation did not converge in 64 "
                           "rounds")

    out = hash_agg(labels.map_batches(
        lambda t: t.append_column("one", pa.array(
            np.ones(len(t), np.int64))), batch_format="pyarrow"),
        "label", [("one", "sum", "n_members")]).to_pandas()
    out = out.rename(columns={"label": "canonical_title"})
    return out.sort_values("canonical_title").reset_index(drop=True)


def q_popularity_hitrate(sf_dir: str):
    """Recommender EVALUATION with a TEMPORAL SPLIT (train < day
    19743 = 2024-01-21 < test): the popularity baseline recommends
    each user the first 3 of the train-window global top-20 items
    (by distinct viewers, ties item asc) they have NOT viewed in
    train; hit-rate@3 = share of test-purchasing users with ≥1
    recommended item among their test purchases. The top-20 list is
    catalog-sized and broadcast; seen-sets and gold-sets live in one
    per-user partition pass. Floor-ppm hit rate; fully
    SQL-expressible, so the eval has a true independent oracle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_starts, ts_us)

    SPLIT_DAY = 19743
    TOPN = 20
    K = 3

    def prep(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column("event_type"),
                        value_set=pa.array(["view", "purchase"]))
        t = batch.filter(mask)
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        item = pc.cast(pc.struct_field(pc.extract_regex(
            col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        day = pa.array(ts_us(t.column("ts")) // 86_400_000_000,
                       pa.int64())
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "item": item, "day": day,
            "event_type": t.column("event_type")})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type", "props"]
                  ).map_batches(prep,
                                batch_format="pyarrow").materialize()

    # train-window global popularity: distinct (user, item) viewers
    def train_views(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t.column("event_type"), "view"),
                    pc.less(t.column("day"), SPLIT_DAY))
        f = t.filter(m)
        return pa.table({"user_id": f.column("user_id"),
                         "item": f.column("item")}).group_by(
            ["user_id", "item"]).aggregate([])

    def one(t: pa.Table) -> pa.Table:
        import numpy as np

        return t.append_column("one", pa.array(
            np.ones(len(t), np.int64)))

    distinct_ui = hash_agg(
        ev.map_batches(train_views, batch_format="pyarrow"
                       ).map_batches(one, batch_format="pyarrow"),
        "user_id", [("one", "max", "one")],
        group_cols=["user_id", "item"])
    pop = hash_agg(distinct_ui, "item", [("one", "sum", "n")]
                   ).to_pandas()
    pop = pop.sort_values(["n", "item"],
                          ascending=[False, True]).head(TOPN)
    top_items = pop["item"].to_numpy(dtype=np.int64)
    ref = ray.put(top_items)

    def hits(t: pa.Table) -> pa.Table:
        empty = pa.table({"n_users": pa.array([], pa.int64()),
                          "n_hits": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if not len(u):
            return empty
        it = t.column("item").to_numpy(zero_copy_only=False)
        day = t.column("day").to_numpy(zero_copy_only=False)
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        top = ray.get(ref)
        starts = segment_starts(u)
        ends = np.r_[starts[1:], len(u)]
        n_users = n_hits = 0
        for s, e in zip(starts, ends):
            sl = slice(s, e)
            gold = set(it[sl][(et[sl] == "purchase")
                              & (day[sl] >= SPLIT_DAY)].tolist())
            if not gold:
                continue
            seen = set(it[sl][(et[sl] == "view")
                              & (day[sl] < SPLIT_DAY)].tolist())
            recs = [x for x in top if x not in seen][:K]
            n_users += 1
            n_hits += int(any(x in gold for x in recs))
        return pa.table({"n_users": pa.array([n_users], pa.int64()),
                         "n_hits": pa.array([n_hits], pa.int64())})

    agg = map_key_partitions(ev, "user_id", hits).aggregate(
        Sum("n_users", alias_name="n_users"),
        Sum("n_hits", alias_name="n_hits"))
    n_users, n_hits = int(agg["n_users"]), int(agg["n_hits"])
    return pd.DataFrame({
        "n_users": pd.Series([n_users], dtype="int64"),
        "n_hits": pd.Series([n_hits], dtype="int64"),
        "hitrate_ppm": pd.Series([(1_000_000 * n_hits) // n_users],
                                 dtype="int64")})


def q_ht_estimate(sf_dir: str):
    """HORVITZ-THOMPSON estimation from the importance sample (survey
    statistics over sampled corpora): each accepted doc contributes
    its token count inverse-weighted by its inclusion probability —
    floor(n_tokens·10⁶ / w_ppm) per doc, summed exactly — giving an
    unbiased estimate of the TRUE total token count, which is also
    computed exactly for the error column. All integer; the sample,
    the weights and the estimator are each SQL-reproducible."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from magic_content_extractor_ray.stages.sample import (
        importance_sample)
    from magic_content_extractor_ray.stages.textops import token_counts

    ds = _read_pq(f"{sf_dir}/documents.parquet",
                  columns=["doc_id", "text"])

    def weight(batch: pa.Table) -> pa.Table:
        batch = token_counts(batch)
        w = pc.min_element_wise(
            pc.multiply(batch.column("n_tokens"),
                        pa.scalar(5000, pa.int64())),
            pa.scalar(1_000_000, pa.int64()))
        return batch.select(["doc_id", "n_tokens"]).append_column(
            "w_ppm", pc.cast(w, pa.int64()))

    weighted = ds.map_batches(weight,
                              batch_format="pyarrow").materialize()
    true_total = int(weighted.sum("n_tokens"))

    def contrib(batch: pa.Table) -> pa.Table:
        ht = pc.divide(  # int64 floor division
            pc.multiply(batch.column("n_tokens"),
                        pa.scalar(1_000_000, pa.int64())),
            batch.column("w_ppm"))
        return pa.table({
            "one": pa.array([len(batch)], pa.int64()),
            "ht": pa.array([pc.sum(ht).as_py() or 0], pa.int64())})

    agg = importance_sample(weighted, weight_ppm_column="w_ppm"
                            ).map_batches(
        contrib, batch_format="pyarrow").aggregate(
        Sum("one", alias_name="n_sampled"),
        Sum("ht", alias_name="ht_total"))
    n_sampled, ht_total = int(agg["n_sampled"]), int(agg["ht_total"])
    return pd.DataFrame({
        "n_sampled": pd.Series([n_sampled], dtype="int64"),
        "ht_total_tokens": pd.Series([ht_total], dtype="int64"),
        "true_total_tokens": pd.Series([true_total], dtype="int64"),
        "err_ppm": pd.Series(
            [(1_000_000 * abs(ht_total - true_total)) // true_total],
            dtype="int64")})


_POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                 0.9196986029286058, 0.9810118431238462,
                 0.9963401531726563, 0.9994058151824183,
                 0.9999167588507119)


def q_bootstrap_ci(sf_dir: str):
    """DETERMINISTIC Poisson bootstrap CI for mean doc length per
    lang: 20 resample replicates where each doc's weight in replicate
    r is Poisson(1)-distributed via the inverse CDF of the md5(doc:r)
    uniform (the dp_lang_counts seeded-noise idiom) — so the SQL twin
    reproduces every weight with a CASE ladder on the same literal
    thresholds. Replicate means are exact floor micro-chars; the
    CI is quantile_disc(0.1/0.9) over the 20 replicate estimates
    (index floor((n−1)q), mirrored). One (lang × 20)-cell combiner
    shuffle; nothing row-scale leaves the batches."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    R = 20
    TH = np.array(_POISSON1_CDF)

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        chars = batch.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        langs = batch.column("lang").to_numpy(zero_copy_only=False)
        out = {"lang": [], "rep": [], "sw": [], "swc": []}
        w = np.empty((len(ids), R), dtype=np.int64)
        for r in range(R):
            u = np.array([int(hashlib.md5(
                f"{d}:boot:{r}".encode()).hexdigest()[:8], 16)
                for d in ids], dtype=np.float64)
            u = (u + 0.5) / 4294967296.0
            w[:, r] = np.searchsorted(TH, u, side="right")
        for lang in np.unique(langs):
            m = langs == lang
            wm = w[m]
            cm = chars[m]
            for r in range(R):
                out["lang"].append(str(lang))
                out["rep"].append(r)
                out["sw"].append(int(wm[:, r].sum()))
                out["swc"].append(int((wm[:, r] * cm).sum()))
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "rep": pa.array(out["rep"], pa.int64()),
            "sw": pa.array(out["sw"], pa.int64()),
            "swc": pa.array(out["swc"], pa.int64())})

    cells = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["doc_id", "lang", "n_chars"]
                     ).map_batches(partial, batch_format="pyarrow"
                                   ).groupby(["lang", "rep"]).aggregate(
        Sum("sw", alias_name="sw"),
        Sum("swc", alias_name="swc")).to_pandas()
    cells["est"] = (1_000_000 * cells["swc"]) // cells["sw"]
    rows = []
    for lang, g in cells.groupby("lang", sort=True):
        est = np.sort(g["est"].to_numpy(dtype=np.int64))
        n = len(est)
        rows.append({"lang": lang, "n_reps": n,
                     "lo_micro": int(est[(n - 1) * 10 // 100]),
                     "hi_micro": int(est[(n - 1) * 90 // 100])})
    return pd.DataFrame(rows).astype(
        {"n_reps": "int64", "lo_micro": "int64", "hi_micro": "int64"})


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


def q_hll_twin(sf_dir: str):
    """HyperLogLog with a BIT-EXACT SQL twin (the snapshot-checked
    distinct_users_approx upgraded to a true independent oracle): the
    sketch's splitmix64 hash is re-derived in SQL via HUGEINT
    mod-2^64 split multiplies, register ranks via printf('%b') bit
    lengths (never float log2), and the 1/2^reg harmonic sum is
    carried as the EXACT dyadic integer Σ 2^(53−rank) — one
    correctly-rounded HUGEINT→DOUBLE cast replaces the
    order-dependent float sum, so both engines produce the identical
    estimate double (then floor). Per event_type: exact distinct,
    non-zero registers, HLL estimate, error ppm."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.sketch import HllSketch
    from magic_content_extractor_ray.stages.window import hash_agg

    P, M = 12, 4096

    def sketch_batch(batch: pa.Table) -> pa.Table:
        keys, sks = [], []
        for k in pc.unique(batch.column("event_type")).to_pylist():
            sub = batch.filter(pc.equal(batch.column("event_type"), k))
            s = HllSketch(P)
            s.add_many(sub.column("user_id").to_numpy(
                zero_copy_only=False))
            keys.append(k)
            sks.append(s.to_bytes())
        return pa.table({"event_type": pa.array(keys, pa.string()),
                         "sketch": pa.array(sks, pa.binary())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["event_type", "user_id"]).materialize()
    rows = ev.map_batches(sketch_batch,
                          batch_format="pyarrow").take_all()
    merged: dict[str, HllSketch] = {}
    for r in rows:
        s = HllSketch.from_bytes(r["sketch"], P)
        k = r["event_type"]
        merged[k] = merged[k].merge(s) if k in merged else s

    def distinct_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate([])
        return g.append_column("one", pa.array(
            np.ones(len(g), np.int64)))

    exact = hash_agg(
        hash_agg(ev.map_batches(distinct_partial,
                                batch_format="pyarrow"),
                 "user_id", [("one", "max", "one")],
                 group_cols=["event_type", "user_id"]),
        "event_type", [("one", "sum", "n_exact")]).to_pandas()
    exact_by = dict(zip(exact["event_type"], exact["n_exact"]))

    out = []
    for etype in sorted(merged):
        reg = merged[etype].registers
        counts = np.bincount(reg, minlength=54)
        s_int = sum(int(c) << (53 - k)
                    for k, c in enumerate(counts) if c)
        inv = float(s_int) / 9007199254740992.0
        alpha = 0.7213 / (1.0 + 1.079 / 4096.0)
        e = alpha * 4096.0 * 4096.0 / inv
        zeros = int(counts[0])
        if e <= 2.5 * 4096.0 and zeros:
            est = 4096.0 * math.log(4096.0 / float(zeros))
        else:
            est = e
        est_i = math.floor(est)
        n_exact = int(exact_by[etype])
        out.append({"event_type": etype, "n_exact": n_exact,
                    "nonzero_regs": M - zeros, "hll_estimate": est_i,
                    "err_ppm": (1_000_000 * abs(est_i - n_exact))
                    // n_exact})
    return pd.DataFrame(out).astype(
        {"n_exact": "int64", "nonzero_regs": "int64",
         "hll_estimate": "int64", "err_ppm": "int64"})


_CDC_BJ = (1, 257, 66049, 16974593, 67503107, 168429323,
           336663071, 623063367)  # 257^j mod (2^31-1), j = 0..7


def q_cdc_chunks(sf_dir: str):
    """CONTENT-DEFINED CHUNKING (the dedup-storage primitive: chunk
    boundaries follow content, so an insertion only reshuffles local
    chunks): a boundary closes after position i when the degree-8
    polynomial rolling hash of the trailing window ≡ 0 (mod 64) —
    expected ~64-char chunks. The whole batch is ONE flat codepoint
    array: the 8 shifted-multiply terms are vectorized adds, doc
    boundaries masked by in-doc offset. All integer (Σ c·(257^j mod
    M) < 2^42, one final mod), so the SQL twin (LAG ladder over
    unnested positions) matches exactly. Output per doc: chunk count
    + length."""
    import numpy as np
    import pyarrow as pa

    M = 2147483647
    BJ = np.array(_CDC_BJ, dtype=np.int64)

    def chunks(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        if not len(texts) or lens.sum() == 0:
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "n_chars": pa.array(lens, pa.int64()),
                             "n_chunks": pa.array(
                                 np.ones(len(ids), np.int64))})
        codes = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        n = len(codes)
        h = np.zeros(n, dtype=np.int64)
        for j, bj in enumerate(BJ):
            h[j:] += codes[:n - j if j else n] * bj
        h %= M
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        offset = np.arange(n) - np.repeat(starts, lens)
        doc = np.repeat(np.arange(len(ids)), lens)
        # boundary closes after i: needs a full window and must not
        # sit on the doc's last char (no empty trailing chunk)
        boundary = ((h % 64 == 0) & (offset >= 7)
                    & (offset <= np.repeat(lens, lens) - 2))
        nb = np.bincount(doc[boundary], minlength=len(ids))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_chars": pa.array(lens, pa.int64()),
                         "n_chunks": pa.array(nb + 1, pa.int64())})

    out = _read_pq(f"{sf_dir}/documents.parquet",
                   columns=["doc_id", "text"]).map_batches(
        chunks, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


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


def q_burst_viterbi(sf_dir: str):
    """VITERBI decoding of a 2-state burst model (Kleinberg's
    automaton: low-rate vs 4× high-rate exponential emissions over
    inter-event gaps, 1.0-nat switch penalty) — the stateful sequence
    DP family. Costs are half-up integer NANO-nats per (state, gap),
    so the whole DP is exact integer min-plus algebra; ties prefer
    the stay branch and the final L state, mirrored by the SQL twin's
    recursive CTE. The DP is sequential per user but VECTORIZED
    ACROSS USERS inside each hash partition: one numpy step per gap
    INDEX (bounded by the longest per-user sequence), all users
    advance together. Output per user (≥2 events): gap count, optimal
    path cost, number of HIGH states on the optimal path."""
    import math

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    GAMMA = 1_000_000_000  # 1.0 nat switch penalty, nano
    A_L, A_H = 1.0 / 3600.0, 4.0 / 3600.0
    LN_L, LN_H = math.log(1.0 / 3600.0), math.log(4.0 / 3600.0)

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "t": pa.array(ts_us(batch.column("ts")), pa.int64()),
            "event_id": pc.cast(batch.column("event_id"), pa.int64())})

    def viterbi(t: pa.Table) -> pa.Table:
        empty = pa.table({"user_id": pa.array([], pa.int64()),
                          "n_gaps": pa.array([], pa.int64()),
                          "cost_nano": pa.array([], pa.int64()),
                          "n_high": pa.array([], pa.int64())})
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        if len(u) < 2:
            return empty
        ts = t.column("t").to_numpy(zero_copy_only=False)
        same = u[1:] == u[:-1]
        gaps = (ts[1:] - ts[:-1])[same]
        gu = u[1:][same]
        if not len(gu):
            return empty
        gstarts = segment_starts(gu)
        glens = segment_lengths(gstarts, len(gu))
        gsec = gaps.astype(np.float64) / 1000000.0

        def cost(a, ln_a, g):
            return np.floor((a * g - ln_a) * 1e9 + 0.5).astype(np.int64)

        nseg = len(gstarts)
        g0 = gsec[gstarts]
        cl = cost(A_L, LN_L, g0)
        ch = cost(A_H, LN_H, g0)
        nl = np.zeros(nseg, dtype=np.int64)
        nh = np.ones(nseg, dtype=np.int64)
        for i in range(1, int(glens.max())):
            act = np.flatnonzero(glens > i)
            if not len(act):
                break
            g_i = gsec[gstarts[act] + i]
            pcl, pch = cl[act], ch[act]
            pnl, pnh = nl[act], nh[act]
            stay_l = pcl <= pch + GAMMA
            base_l = np.where(stay_l, pcl, pch + GAMMA)
            from_l = np.where(stay_l, pnl, pnh)
            stay_h = pch <= pcl + GAMMA
            base_h = np.where(stay_h, pch, pcl + GAMMA)
            from_h = np.where(stay_h, pnh, pnl)
            cl[act] = cost(A_L, LN_L, g_i) + base_l
            nl[act] = from_l
            ch[act] = cost(A_H, LN_H, g_i) + base_h
            nh[act] = from_h + 1
        pick_l = cl <= ch
        return pa.table({
            "user_id": pa.array(gu[gstarts], pa.int64()),
            "n_gaps": pa.array(glens, pa.int64()),
            "cost_nano": pa.array(np.where(pick_l, cl, ch), pa.int64()),
            "n_high": pa.array(np.where(pick_l, nl, nh), pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id"]
                  ).map_batches(prep, batch_format="pyarrow")
    out = map_key_partitions(ev, "user_id", viterbi,
                             sort_cols=["t", "event_id"]).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_audio_metadata(sf_dir: str):
    """Audio-metadata extraction from REAL WAV bytes with an
    INDEPENDENT oracle (the audio twin of media_dimensions): one
    deterministic ref per doc → fetch_media_stub synthesizes real
    PCM WAV (frame count seeded from md5(ref)) → this stage parses
    the actual RIFF header via the stdlib wave module. The SQL twin
    re-derives frame counts from md5(ref), so a header misread fails
    the hash."""
    import io
    import wave

    import pyarrow as pa

    from magic_content_extractor_ray.stages.multimodal import (
        fetch_media_stub)

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": pa.array(
                [f"https://media.example/{i}/audio-0.wav"
                 for i in ids], pa.string()),
            "kind": pa.array(["audio"] * len(ids), pa.string())})

    def fetch(batch: pa.Table) -> pa.Table:
        media = fetch_media_stub(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "media_ref": media.column("media_ref"),
                         "payload": media.column("payload")})

    def header(batch: pa.Table) -> pa.Table:
        rates, chans, widths, frames = [], [], [], []
        for p in batch.column("payload").to_pylist():
            with wave.open(io.BytesIO(p), "rb") as wf:
                rates.append(wf.getframerate())
                chans.append(wf.getnchannels())
                widths.append(wf.getsampwidth())
                frames.append(wf.getnframes())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": batch.column("media_ref"),
            "rate_hz": pa.array(rates, pa.int64()),
            "channels": pa.array(chans, pa.int64()),
            "sample_bytes": pa.array(widths, pa.int64()),
            "n_frames": pa.array(frames, pa.int64()),
            "duration_ms": pa.array(
                [f * 1000 // r for f, r in zip(frames, rates)],
                pa.int64())})

    out = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"]
                   ).map_batches(to_refs, batch_format="pyarrow"
                                 ).map_batches(
        fetch, batch_format="pyarrow", batch_size=256
    ).map_batches(header, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_item_cheapest_path(sf_dir: str):
    """WEIGHTED single-source shortest paths over the co-view graph
    (edge cost = 10⁶ // co-view count: strong affinity = cheap) —
    distributed Bellman-Ford: each round one keyed exchange relaxes
    every settled node's edges and a hash_agg min merges candidates
    with current distances; distances only decrease, so the tagged
    changed-count fixpoint test is exact. Integer costs throughout;
    source = the graph's min item (deterministic at any sf). Bounded
    64 rounds (≥ the weighted-path hop diameter) with a loud
    failure. The SQL twin runs the same relaxation as a recursive
    CTE with a strict-improvement guard."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_starts)

    MIN_USERS = 2
    MAX_ROUNDS = 64

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        n = t.column("n_users").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        w = 1_000_000 // n
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            "w": pa.array(np.concatenate([w, w]), pa.int64())})

    adj = edges.map_batches(symmetrize,
                            batch_format="pyarrow").materialize()
    src = int(adj.min("node"))
    import ray.data as rd

    dist = rd.from_arrow(pa.table({
        "node": pa.array([src], pa.int64()),
        "cost": pa.array([0], pa.int64())})).materialize()

    def tag_dist(t: pa.Table) -> pa.Table:
        return pa.table({"node": t.column("node"),
                         "nbr": pa.nulls(len(t), pa.int64()),
                         "w": t.column("cost")})

    def relax(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        empty = pa.table({"node": pa.array([], pa.int64()),
                          "cost": pa.array([], pa.int64())})
        if not len(node):
            return empty
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        w = t.column("w").to_numpy(zero_copy_only=False)
        is_d = pd.isna(nbr)
        starts = segment_starts(node)
        seg = np.searchsorted(starts, np.arange(len(node)),
                              side="right") - 1
        seg_cost = np.full(len(starts), -1, dtype=np.int64)
        seg_cost[seg[is_d]] = w[is_d]
        out_n = [node[is_d]]
        out_c = [w[is_d].astype(np.int64)]
        em = (~is_d) & (seg_cost[seg] >= 0)
        if em.any():
            out_n.append(nbr[em].astype(np.int64))
            out_c.append(seg_cost[seg[em]] + w[em].astype(np.int64))
        return pa.table({
            "node": pa.array(np.concatenate(out_n), pa.int64()),
            "cost": pa.array(np.concatenate(out_c), pa.int64())})

    # distances are monotone: node count only grows, total cost of
    # settled nodes only shrinks — (count, sum) equality IS the
    # fixpoint test, two cheap aggregates instead of a keyed exchange
    cnt, csum = 1, 0
    for _ in range(MAX_ROUNDS):
        tagged = dist.map_batches(tag_dist,
                                  batch_format="pyarrow").union(adj)
        new_dist = hash_agg(
            map_key_partitions(tagged, "node", relax),
            "node", [("cost", "min", "cost")]).materialize()
        new_cnt = new_dist.count()
        new_sum = int(new_dist.sum("cost"))
        stable = new_cnt == cnt and new_sum == csum
        dist, cnt, csum = new_dist, new_cnt, new_sum
        if stable:
            break
    else:
        raise RuntimeError("shortest-path relaxation did not converge "
                           f"in {MAX_ROUNDS} rounds")

    out = dist.to_pandas()
    return out.sort_values("node").reset_index(drop=True).rename(
        columns={"node": "item", "cost": "cost"})


def q_edge_churn(sf_dir: str):
    """TEMPORAL GRAPH churn: Jaccard overlap of CONSECUTIVE weeks'
    co-view edge sets (how fast the item-affinity structure turns
    over). Weekly edges are per-(user, week) triangular pair
    expansion (hub-capped); the week-set overlap rides the
    _tag_set_overlap bitmask machinery — the edge-key set never
    reaches the driver, only the ≤2^weeks mask histogram (weeks are
    calendar-bounded). Consecutive-week rows only; zero-overlap
    pairs are absent by the helper's contract (mirrored in SQL)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts, ts_us)

    WEEK_US = 604_800_000_000

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        item = pc.cast(pc.struct_field(pc.extract_regex(
            col, r'"k":\s*(?P<k>-?\d+)'), "k"), pa.int64())
        return pa.table({
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "week": pa.array(ts_us(t.column("ts")) // WEEK_US,
                             pa.int64()),
            "item": item}).group_by(
            ["user_id", "week", "item"]).aggregate([])

    def weekly_pairs(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pa.table({"pk": pa.array([], pa.int64()),
                          "week": pa.array([], pa.int64())})
        if not len(u):
            return empty
        wk = t.column("week").to_numpy(
            zero_copy_only=False).astype(np.int64)
        it = t.column("item").to_numpy(
            zero_copy_only=False).astype(np.int64)
        if it.min() < 0 or it.max() >= (1 << 31):
            raise ValueError("edge pack needs item ids in [0, 2^31)")
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = ((u[1:] != u[:-1]) | (wk[1:] != wk[:-1])
                    | (it[1:] != it[:-1]))
        u, wk, it = u[keep], wk[keep], it[keep]
        # segments = (user, week); cap items per segment like covis
        seg_key = u * (1 << 20) + wk  # weeks < 2^20: no collision
        seg_key, it = _cap_user_items(seg_key, it)
        wk = seg_key & np.int64((1 << 20) - 1)
        starts = segment_starts(seg_key)
        lens = segment_lengths(starts, len(seg_key))
        sel = lens >= 2
        starts, lens = starts[sel], lens[sel]
        counts = lens * (lens - 1) // 2
        total = int(counts.sum())
        if total == 0:
            return empty
        seg = np.repeat(np.arange(len(lens)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
        tloc = np.arange(total, dtype=np.int64) - np.repeat(offs,
                                                            counts)
        length = lens[seg]
        a = (length - 2 - np.floor(
            (np.sqrt(-8.0 * tloc + 4.0 * length * (length - 1) - 7.0)
             - 1.0) / 2.0)).astype(np.int64)
        b = tloc + a + 1 - length * (length - 1) // 2 \
            + (length - a) * (length - a - 1) // 2
        base = starts[seg]
        pk = (it[base + a] << np.int64(31)) | it[base + b]
        return pa.table({
            "pk": pa.array(pk, pa.int64()),
            "week": pa.array(wk[base], pa.int64())})

    ui = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_type", "props"]
                  ).map_batches(prep, batch_format="pyarrow")
    keyed = map_key_partitions(ui, "user_id", weekly_pairs,
                               sort_cols=["week", "item"])
    out = _tag_set_overlap(keyed, key="pk", tag="week",
                           prefix="week")
    out = out[out["week_b"] == out["week_a"] + 1].reset_index(
        drop=True)
    return out.astype({"week_a": "int64", "week_b": "int64"})


def q_l_diversity(sf_dir: str):
    """Privacy audit beyond k-anonymity: L-DIVERSITY of the sensitive
    attribute (market segment) within each quasi-identifier group
    (nation) — distinct-l plus ENTROPY-l (Shannon entropy of the
    within-group segment distribution, integer nano-nats via the
    user_entropy c·ln(c) idiom). Bounded (nations × segments) cells;
    one combiner pass."""
    import math

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "c_mktsegment": t.column("c_mktsegment"),
        }).group_by(["c_nationkey", "c_mktsegment"]).aggregate(
            [([], "count_all")])
        return pa.table({"c_nationkey": g.column("c_nationkey"),
                         "c_mktsegment": g.column("c_mktsegment"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    cells = _read_pq(f"{sf_dir}/customer.parquet",
                     columns=["c_nationkey", "c_mktsegment"]
                     ).map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    cells = cells.groupby(["c_nationkey", "c_mktsegment"],
                          as_index=False)["c"].sum()
    rows = []
    for nat, g in cells.groupby("c_nationkey", sort=True):
        cs = [int(x) for x in g["c"]]
        n = sum(cs)
        s = sum(int(math.floor(c * math.log(c) * 1e9 + 0.5))
                for c in cs)
        ent = int(math.floor(
            (math.log(n) - s / 1e9 / n) * 1e9 + 0.5))
        rows.append({"c_nationkey": int(nat), "n_customers": n,
                     "l_distinct": len(cs), "entropy_nano": ent})
    return pd.DataFrame(rows).astype(
        {"n_customers": "int64", "l_distinct": "int64",
         "entropy_nano": "int64"})


def q_apportion_sample(sf_dir: str):
    """Hamilton LARGEST-REMAINDER apportionment of a fixed sampling
    budget (N=1000 docs) across the (lang, source) corpus cells — the
    constrained-allocation step of training-mixture construction:
    per-cell quotas that sum EXACTLY to the budget, unlike independent
    rounding. All integer: base = (N·c) // T bigint floor, remainder
    (N·c) mod T; the L = N − Σbase leftover seats go to the largest
    remainders (ties: lang, source ascending). One combiner map pass;
    only the bounded |langs|×|sources| cell table reaches the driver."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    N = 1000

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["lang", "source"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "source": g.column("source"),
                         "c": pc.cast(g.column("count_all"),
                                      pa.int64())})

    cells = _read_pq(f"{sf_dir}/documents.parquet",
                     columns=["lang", "source"]).map_batches(
        partial, batch_format="pyarrow").to_pandas()
    cells = cells.groupby(["lang", "source"], as_index=False)["c"].sum()
    total = int(cells["c"].sum())
    cells["n_docs"] = cells["c"].astype("int64")
    cells["base"] = [N * int(c) // total for c in cells["c"]]
    cells["rem"] = [N * int(c) % total for c in cells["c"]]
    leftover = N - int(cells["base"].sum())
    order = cells.sort_values(
        ["rem", "lang", "source"],
        ascending=[False, True, True]).index[:leftover]
    cells["seats"] = cells["base"]
    cells.loc[order, "seats"] += 1
    out = cells[["lang", "source", "n_docs", "seats"]].sort_values(
        ["lang", "source"]).reset_index(drop=True)
    return out.astype({"n_docs": "int64", "seats": "int64"})


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


def q_t_closeness(sf_dir: str):
    """Privacy-audit triptych completion (with [[k_anonymity]] and
    [[l_diversity]]): T-CLOSENESS of the sensitive attribute (market
    segment, ordered lexicographically) within each quasi-identifier
    group (nation) — the ordered-category Earth Mover's Distance
    between the within-group segment distribution and the global one,
    normalized by its max (K−1). Exact rationals: EMD numerator
    Σ_k |cumsum(c_gk·N − C_k·n_g)| is integer; emd_nano is ONE integer
    floor division by n_g·N·(K−1). One combiner pass; only the bounded
    nations × segments grid reaches the driver."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = pa.table({
            "nat": pc.cast(t.column("c_nationkey"), pa.int64()),
            "seg": t.column("c_mktsegment"),
        }).group_by(["nat", "seg"]).aggregate([([], "count_all")])
        return pa.table({"nat": g.column("nat"), "seg": g.column("seg"),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    cells = _read_pq(f"{sf_dir}/customer.parquet",
                     columns=["c_nationkey", "c_mktsegment"]
                     ).map_batches(partial,
                                   batch_format="pyarrow").to_pandas()
    cells = cells.groupby(["nat", "seg"], as_index=False)["c"].sum()
    grid = cells.pivot_table(index="nat", columns="seg", values="c",
                             fill_value=0, aggfunc="sum").sort_index(
        axis=1)
    glob = [int(x) for x in grid.sum(axis=0)]
    N = sum(glob)
    K = len(glob)
    rows = []
    for nat, r in grid.iterrows():
        cs = [int(x) for x in r]
        ng = sum(cs)
        run, num = 0, 0
        for c, cg in zip(cs, glob):
            run += c * N - cg * ng
            num += abs(run)
        emd = (num * 10**9) // (ng * N * (K - 1))
        rows.append({"c_nationkey": int(nat), "n_customers": ng,
                     "emd_nano": emd})
    return pd.DataFrame(rows).astype(
        {"n_customers": "int64", "emd_nano": "int64"})


def q_mannwhitney(sf_dir: str):
    """Mann-Whitney U rank-sum test: do BUILDING-segment customers
    place differently-priced orders than MACHINERY-segment ones? The
    nonparametric two-sample test an A/B pipeline runs when totals are
    heavy-tailed. Defined over integer CENTS (floor(p·100+0.5), the
    shared quantization both engines rank) so tied-rank handling is
    exact. Distributed shape: segment membership broadcast once via
    ray.put (dimension-sized), per-value (cents) tie cells via one
    hash_agg shuffle, rank positions from the range-bucketed two-phase
    scan (keyed_prefix_sum) — rank sums carried ×2 so average tie
    ranks stay integral; per-batch partials merged as Python bigints.
    Tie guard: a single price value with ≥2²¹ duplicates would
    overflow the int64 t³ partial — raise, don't corrupt (the
    covisitation range-guard idiom). z from the tie-corrected normal
    approximation, nano-scaled with the shared floor(x·1e9+0.5)
    rounding; float steps (casts, one division, one sqrt) are IEEE
    correctly-rounded and mirrored op-for-op by the SQL twin."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import hash_agg

    segs = _read_pq(f"{sf_dir}/customer.parquet",
                    columns=["c_custkey", "c_mktsegment"]).to_pandas()
    g1_ref = ray.put(np.sort(segs.loc[
        segs["c_mktsegment"] == "BUILDING", "c_custkey"].to_numpy(
        ).astype(np.int64)))
    g2_ref = ray.put(np.sort(segs.loc[
        segs["c_mktsegment"] == "MACHINERY", "c_custkey"].to_numpy(
        ).astype(np.int64)))

    def tag(t: pa.Table) -> pa.Table:
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False)
        g1 = np.isin(ck, ray.get(g1_ref))
        g2 = np.isin(ck, ray.get(g2_ref))
        keep = g1 | g2
        p = t.column("o_totalprice").to_numpy(
            zero_copy_only=False)[keep]
        v = np.floor(p * 100.0 + 0.5).astype(np.int64)
        return pa.table({"v": pa.array(v, pa.int64()),
                         "g1": pa.array(g1[keep].astype(np.int64),
                                        pa.int64())})

    tagged = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_custkey", "o_totalprice"]).map_batches(
        tag, batch_format="pyarrow")
    cells = hash_agg(tagged, "v",
                     [("g1", "sum", "n1c"), ("g1", "count", "t")])
    scanned = keyed_prefix_sum(cells, key_column="v", value_column="t",
                               out_column="cb")

    def partial(t: pa.Table) -> pa.Table:
        n1c = t.column("n1c").to_numpy(zero_copy_only=False)
        tt = t.column("t").to_numpy(zero_copy_only=False)
        cb = t.column("cb").to_numpy(zero_copy_only=False)
        if np.any(tt >= (1 << 21)):
            raise ValueError("tie group >= 2^21 rows: t^3 partial "
                             "would overflow int64")
        return pa.table({
            "r12": pa.array([int((n1c * (2 * cb + tt + 1)).sum())]),
            "tie": pa.array([int((tt * tt * tt - tt).sum())]),
            "n1": pa.array([int(n1c.sum())]),
            "n2": pa.array([int((tt - n1c).sum())])})

    parts = scanned.map_batches(partial,
                                batch_format="pyarrow").to_pandas()
    r12 = sum(int(x) for x in parts["r12"])
    tie = sum(int(x) for x in parts["tie"])
    n1 = sum(int(x) for x in parts["n1"])
    n2 = sum(int(x) for x in parts["n2"])
    n = n1 + n2
    u2 = r12 - n1 * (n1 + 1)            # 2·U1, exact integer
    z_num = u2 - n1 * n2                # 2·(U1 − μ)
    var_num = n1 * n2 * ((n * n * n - n) - tie)
    var_den = 12 * n * (n - 1)
    z = (float(z_num) / 2.0) / math.sqrt(
        float(var_num) / float(var_den))
    z_nano = int(math.floor(z * 1e9 + 0.5))
    return pd.DataFrame([{"n1": n1, "n2": n2, "u2": u2,
                          "z_nano": z_nano}]).astype("int64")


def q_dup_spans(sf_dir: str):
    """Merged duplicate-SPAN coverage per doc (Lee et al. 2022 substring
    dedup at word granularity): fraction of each doc's tokens covered by
    a word-5-gram occurring ≥2 times corpus-wide, duplicated positions
    interval-merged (stages/dedup.duplicate_span_stats: one exchange on
    the ngram hash where segment length = corpus frequency, one doc
    exchange with a vectorized union-of-intervals sweep)."""
    from magic_content_extractor_ray.stages.dedup import (
        duplicate_span_stats)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    return duplicate_span_stats(docs, n=5, min_count=2).sort("doc_id")


def q_pca_power(sf_dir: str):
    """Top principal component of the embedding cloud by MATRIX-SQUARING
    power iteration, exact to the last bit: the distributed part is the
    same integer sufficient-stats pass as embedding_covariance
    (per-batch int64 Gram partials, merged as bignums on the driver —
    bounded by batch count, never rows); the 64×64 iteration runs
    driver-side in exact Python-int arithmetic (the legitimately small
    dim² side). Repeated squaring (10 rounds → effective power 2¹⁰)
    instead of plain matvecs because the synthetic cloud is near-
    isotropic (λ₂/λ₁ ≈ 0.93: plain power iteration needs ~500 steps;
    squaring gets (λ₂/λ₁)^1024 ≈ 4e-32 in 10). Every step is integer:
    the covariance numerator and each squared matrix renormalize to a
    ±10⁶ grid with round-half-away, and the final vector (M·1) is
    sign-canonicalized (first nonzero loading > 0) — so the
    unrolled-CTE SQL twin reproduces loadings bit-for-bit with no float
    summation order anywhere. Convergence is tested against numpy eigh
    (|cos| ≥ 0.999, tests/test_training_ops.py)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    DIM, SCALE, SQUARINGS = 64, 1_000_000, 10

    def partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"i": z, "j": z, "sxy": z, "sx": z,
                             "sy": z, "n": z})
        m = np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64) * SCALE
        q = np.where(m >= 0, np.floor(m + 0.5),
                     np.ceil(m - 0.5)).astype(np.int64)
        gram = q.T @ q
        sums = q.sum(axis=0)
        iu = np.triu_indices(DIM)
        return pa.table({
            "i": pa.array(iu[0].astype(np.int64), pa.int64()),
            "j": pa.array(iu[1].astype(np.int64), pa.int64()),
            "sxy": pa.array(gram[iu], pa.int64()),
            "sx": pa.array(sums[iu[0]], pa.int64()),
            "sy": pa.array(sums[iu[1]], pa.int64()),
            "n": pa.array(np.full(len(iu[0]), len(q), np.int64()),
                          pa.int64())})

    cells = _read_pq(f"{sf_dir}/embeddings.parquet",
                     columns=["embedding"]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096).take_all()

    acc: dict[tuple[int, int], list] = {}
    for r in cells:
        a = acc.setdefault((int(r["i"]), int(r["j"])), [0, 0, 0, 0])
        a[0] += int(r["sxy"])
        a[1] += int(r["sx"])
        a[2] += int(r["sy"])
        a[3] += int(r["n"])

    num = [[0] * DIM for _ in range(DIM)]
    for (i, j), (sxy, sx, sy, n) in acc.items():
        num[i][j] = num[j][i] = n * sxy - sx * sy   # exact bignum

    def rnd(x: int, den: int) -> int:
        """round-half-away(x·SCALE/den) in exact integers, den > 0."""
        ax = (2 * abs(x) * SCALE + den) // (2 * den)
        return ax if x >= 0 else -ax

    mx = max(abs(num[i][j]) for i in range(DIM) for j in range(DIM))
    if mx == 0:
        c = [[0] * DIM for _ in range(DIM)]
    else:
        c = [[rnd(num[i][j], mx) for j in range(DIM)]
             for i in range(DIM)]

    for _ in range(SQUARINGS):
        w = [[sum(c[i][k] * c[k][j] for k in range(DIM))
              for j in range(DIM)] for i in range(DIM)]
        m2 = max(abs(w[i][j]) for i in range(DIM) for j in range(DIM))
        if m2 == 0:
            c = w
            break
        c = [[rnd(w[i][j], m2) for j in range(DIM)] for i in range(DIM)]

    rowsum = [sum(c[i][j] for j in range(DIM)) for i in range(DIM)]
    m3 = max(abs(x) for x in rowsum)
    v = [0] * DIM if m3 == 0 else [rnd(x, m3) for x in rowsum]
    lead = next((x for x in v if x != 0), 0)
    if lead < 0:
        v = [-x for x in v]
    return pd.DataFrame({"i": list(range(DIM)),
                         "loading": v}).astype("int64")


def q_random_walks(sf_dir: str):
    """DETERMINISTIC random-walk corpus over the co-view item graph
    (the node2vec/DeepWalk data-generation stage): one 3-step walk per
    start node, where the step-s transition out of node u is the
    (md5(start:walk:s:u) mod deg(u))-th neighbor in ascending-id order
    — the dp_lang_counts seeded-hash idiom, so the SQL twin replays
    every transition exactly. Graph = covisitation edges (n_users ≥ 2),
    symmetrized. Shape: one ranked-adjacency exchange (rank + degree
    are segment offsets/lengths), then per step ONE degree join (packs
    (cur, idx) into int64) + ONE adjacency join — all hash_joins, no
    per-node loops; walk fan-out is 1, so frontier size stays exactly
    n_nodes at every step."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    MIN_USERS, STEPS = 2, 3

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64())})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow")

    def rank_adj(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        nbr = t.column("nbr").to_numpy(zero_copy_only=False)
        if not len(node):
            z = pa.array([], pa.int64())
            return pa.table({"node": z, "apk": z, "nbr": z, "deg": z,
                             "rank": z})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        rank = np.arange(len(node), dtype=np.int64) - \
            np.repeat(starts, lens)
        deg = np.repeat(lens, lens).astype(np.int64)
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "apk": pa.array((node << np.int64(31)) | rank, pa.int64()),
            "nbr": pa.array(nbr, pa.int64()),
            "deg": pa.array(deg, pa.int64()),
            "rank": pa.array(rank, pa.int64())})

    # adjacency is probed once per walk step (deg join + rank join) plus
    # the start-node scan: materialize ONCE — it is edge-scale (item
    # catalog co-view graph), not event-scale, and re-deriving it from
    # events 2·STEPS times would dominate the job (the k-means
    # projected-materialize policy)
    adj = map_key_partitions(sym, "node", rank_adj,
                             sort_cols=["nbr"]).materialize()

    import pyarrow.compute as pc

    def firsts(t: pa.Table) -> pa.Table:
        f = t.filter(pc.equal(t.column("rank"), 0))
        return pa.table({"cur": f.column("node"), "deg": f.column("deg")})

    deg_t = adj.map_batches(firsts, batch_format="pyarrow")

    frontier = deg_t.map_batches(
        lambda t: pa.table({"start": t.column("cur"),
                            "cur": t.column("cur")}),
        batch_format="pyarrow").materialize()

    step_outs = [frontier.map_batches(
        lambda t: pa.table({"start": t.column("start"),
                            "step": pa.array(
                                np.zeros(len(t), np.int64)),
                            "node": t.column("cur")}),
        batch_format="pyarrow")]

    for s in range(1, STEPS + 1):
        with_deg = hash_join(
            frontier, deg_t, key="cur", left_cols=["start"],
            right_cols=["deg"], how="inner",
            left_types={"cur": pa.int64(), "start": pa.int64()},
            right_types={"cur": pa.int64(), "deg": pa.int64()})

        def pick(t: pa.Table, *, step=s) -> pa.Table:
            cur = t.column("cur").to_numpy(zero_copy_only=False)
            st = t.column("start").to_numpy(zero_copy_only=False)
            deg = t.column("deg").to_numpy(zero_copy_only=False)
            h = np.array([int(hashlib.md5(
                f"{a}:walk:{step}:{c}".encode()).hexdigest()[:8], 16)
                for a, c in zip(st, cur)], dtype=np.int64)
            idx = h % deg
            return pa.table({
                "apk": pa.array((cur << np.int64(31)) | idx, pa.int64()),
                "start": pa.array(st, pa.int64())})

        keyed = with_deg.map_batches(pick, batch_format="pyarrow")
        stepped = hash_join(
            keyed, adj, key="apk", left_cols=["start"],
            right_cols=["nbr"], how="inner",
            left_types={"apk": pa.int64(), "start": pa.int64()},
            right_types={"apk": pa.int64(), "nbr": pa.int64()})
        # frontier is node-scale (one row per start): materialize per
        # step so later steps and the union don't replay earlier joins
        frontier = stepped.map_batches(
            lambda t: pa.table({"start": t.column("start"),
                                "cur": t.column("nbr")}),
            batch_format="pyarrow").materialize()
        step_outs.append(frontier.map_batches(
            lambda t, _s=s: pa.table({
                "start": t.column("start"),
                "step": pa.array(np.full(len(t), _s, np.int64)),
                "node": t.column("cur")}),
            batch_format="pyarrow"))

    out = step_outs[0]
    for o in step_outs[1:]:
        out = out.union(o)
    return out.sort(["start", "step"])


def q_negative_samples(sf_dir: str):
    """DETERMINISTIC negative sampling for contrastive training pairs:
    for every distinct (user, item) purchase positive, draw 4 candidate
    negatives from the item catalog via md5(user:item:neg:r) mod |catalog|
    (the seeded-hash idiom — the SQL twin replays every draw), reject
    any candidate the user actually purchased (partitioned ANTI join on
    the packed (user, candidate) key — never a driver-side set), and
    keep the first 2 survivors by draw index. The catalog is
    dimension-sized, so it is broadcast once via ray.put and indexed
    inside map_batches (the fk_violations broadcast policy); positives
    are fact-scale and stay distributed throughout."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts)

    DRAWS, KEEP, MASK = 4, 2, np.int64((1 << 31) - 1)

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["event_type", "user_id", "props"])

    def pairs_of(kinds):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.is_in(t.column("event_type"),
                                  value_set=pa.array(kinds)))
            col = t.column("props")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            it = pc.cast(pc.struct_field(
                pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
                pa.int64())
            u = pc.cast(t.column("user_id"), pa.int64())
            un = u.to_numpy(zero_copy_only=False)
            itn = it.to_numpy(zero_copy_only=False)
            if len(un) and (un.min() < 0 or un.max() >= (1 << 31)
                            or itn.min() < 0 or itn.max() >= (1 << 31)):
                raise ValueError("negative_samples packs (user, item) "
                                 "into one int64; ids must be in "
                                 "[0, 2^31)")
            out = pa.table({"pk": pa.array((un << np.int64(31)) | itn,
                                           pa.int64())})
            return out.group_by(["pk"]).aggregate([])  # map-side dedup

        return ev.map_batches(f, batch_format="pyarrow")

    def dedup_pk(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        if not len(pk):
            return pa.table({"pk": pa.array([], pa.int64())})
        keep = np.r_[True, pk[1:] != pk[:-1]]   # sorted by key
        return pa.table({"pk": pa.array(pk[keep], pa.int64())})

    pos = map_key_partitions(pairs_of(["purchase"]), "pk", dedup_pk)

    # item catalog: dimension-sized → distinct + driver sort + broadcast
    def items_only(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        it = np.unique(pk & MASK)
        return pa.table({"item": pa.array(it, pa.int64())})

    cat_rows = map_key_partitions(
        pairs_of(["view", "purchase"]).map_batches(
            items_only, batch_format="pyarrow"),
        "item", lambda t: dedup_pk(t.rename_columns(["pk"]))).take_all()
    catalog = np.sort(np.array([r["pk"] for r in cat_rows],
                               dtype=np.int64))
    cat_ref = ray.put(catalog)

    def draws(t: pa.Table) -> pa.Table:
        cat = ray.get(cat_ref)
        n = len(cat)
        empty = pa.table({c: pa.array([], pa.int64())
                          for c in ("pk", "r", "neg", "apk")})
        if n == 0 or not len(t):
            return empty
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        u = pk >> np.int64(31)
        it = pk & MASK
        out_pk, out_r, out_neg = [], [], []
        for r in range(DRAWS):
            idx = np.array([int(hashlib.md5(
                f"{a}:{b}:neg:{r}".encode()).hexdigest()[:8], 16)
                for a, b in zip(u, it)], dtype=np.int64) % n
            out_pk.append(pk)
            out_r.append(np.full(len(pk), r, np.int64))
            out_neg.append(cat[idx])
        neg = np.concatenate(out_neg)
        uu = np.concatenate([u] * DRAWS)
        return pa.table({
            "pk": pa.array(np.concatenate(out_pk), pa.int64()),
            "r": pa.array(np.concatenate(out_r), pa.int64()),
            "neg": pa.array(neg, pa.int64()),
            "apk": pa.array((uu << np.int64(31)) | neg, pa.int64())})

    cand = pos.map_batches(draws, batch_format="pyarrow")

    anti = hash_join(
        cand, pos.map_batches(
            lambda t: t.rename_columns(["apk"]), batch_format="pyarrow"),
        key="apk", left_cols=["pk", "r", "neg"], right_cols=[],
        how="anti",
        left_types={"apk": pa.int64(), "pk": pa.int64(),
                    "r": pa.int64(), "neg": pa.int64()},
        right_types={"apk": pa.int64()})

    def keep2(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        if not len(pk):
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "pos_item": z,
                             "neg_rank": z, "neg_item": z})
        neg = t.column("neg").to_numpy(zero_copy_only=False)
        starts = segment_starts(pk)
        seg = np.cumsum(np.r_[True, pk[1:] != pk[:-1]]) - 1
        rank = np.arange(len(pk), dtype=np.int64) - starts[seg]
        sel = rank < KEEP
        return pa.table({
            "user_id": pa.array((pk >> np.int64(31))[sel], pa.int64()),
            "pos_item": pa.array((pk & MASK)[sel], pa.int64()),
            "neg_rank": pa.array(rank[sel], pa.int64()),
            "neg_item": pa.array(neg[sel], pa.int64())})

    out = map_key_partitions(anti, "pk", keep2, sort_cols=["r"])
    return out.sort(["user_id", "pos_item", "neg_rank"])


def q_decayed_popularity(sf_dir: str):
    """Exponentially TIME-DECAYED item popularity (the streaming
    heavy-hitter ranking a recommender feed keeps): each view event
    contributes exp(−age/τ) with τ = 7 days, age measured back from the
    corpus's max view timestamp. Per-event weights are rounded to
    integer nano-units BEFORE summation (the nano-nat idiom: one
    libm call per row, then exact int64 sums — no float summation
    order anywhere), pre-aggregated per (batch, item) map-side, merged
    by one hash_sum combiner, top-10 by (weight desc, item asc).
    Pass 1 is a constant-size max-timestamp reduce; pass 2 streams."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_sum

    TAU = 7 * 86400

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["ts", "event_type", "props"])

    def max_ts(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "view"))
        if not len(t):
            return pa.table({"m": pa.array([], pa.int64())})
        sec = pc.divide(pc.cast(t.column("ts"), pa.int64()), 1_000_000)
        return pa.table({"m": pa.array([pc.max(sec).as_py()],
                                       pa.int64())})

    parts = ev.map_batches(max_ts, batch_format="pyarrow").take_all()
    if not parts:
        import pandas as pd
        return pd.DataFrame({"item": pd.Series([], dtype="int64"),
                             "n_views": pd.Series([], dtype="int64"),
                             "decayed_nano": pd.Series([], dtype="int64")})
    T = max(int(r["m"]) for r in parts)

    def weights(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "view"))
        col = t.column("props")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        item = pc.cast(pc.struct_field(
            pc.extract_regex(col, r'"k":\s*(?P<k>-?\d+)'), "k"),
            pa.int64()).to_numpy(zero_copy_only=False)
        sec = (pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False) // 1_000_000)
        age = (T - sec).astype(np.float64)
        w = np.floor(np.exp(-age / TAU) * 1e9 + 0.5).astype(np.int64)
        uit, inv = np.unique(item, return_inverse=True)
        return pa.table({
            "item": pa.array(uit, pa.int64()),
            "w": pa.array(_bincount_i64(inv, w, minlength=len(uit)),
                          pa.int64()),
            "n": pa.array(np.bincount(inv, minlength=len(uit))
                          .astype(np.int64), pa.int64())})

    from magic_content_extractor_ray.stages.window import hash_agg

    agg = hash_agg(ev.map_batches(weights, batch_format="pyarrow"),
                   "item", [("w", "sum", "decayed_nano"),
                            ("n", "sum", "n_views")])
    return agg.map_batches(
        lambda t: t.select(["item", "n_views", "decayed_nano"]),
        batch_format="pyarrow").sort(
        ["decayed_nano", "item"], descending=[True, False]).limit(10)


def q_mst_coview(sf_dir: str):
    """Minimum spanning FOREST of the co-view item graph by distributed
    BORŮVKA: edge weight orders by (affinity desc, ia, ib) — strongest
    co-view ties are lightest, and the composite tie-break makes every
    weight distinct, so the MSF is unique and the SQL twin can verify
    it with a DIFFERENT algorithm (one-edge-per-iteration KRUSKAL in a
    recursive CTE) — two independent algorithms, one answer. Per round:
    one broadcast label lookup (labels are item-catalog-scale — the
    fk_violations dimension-broadcast policy), one keyed exchange
    where each component's segment yields its min incident edge via a
    vectorized lexsort, and a driver union-find over the per-component
    minima (≤ #components rows, halving every round — the
    connected_components hybrid policy). Rounds are O(log n); the
    edge-scale dataset is materialized once and re-mapped per round."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_starts)

    MIN_USERS = 2

    def unpack(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table({
            "ia": pa.array(pk >> np.int64(31), pa.int64()),
            "ib": pa.array(pk & np.int64((1 << 31) - 1), pa.int64()),
            "cnt": pa.array(t.column("n_users").to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64())})

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= MIN_USERS).map_batches(
        unpack, batch_format="pyarrow").materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate([
            t.column("ia").to_numpy(zero_copy_only=False),
            t.column("ib").to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u, pa.int64())})

    node_rows = edges.map_batches(endpoints,
                                  batch_format="pyarrow").take_all()
    nodes = np.unique(np.array([r["node"] for r in node_rows],
                               dtype=np.int64))
    if not len(nodes):
        return pd.DataFrame({"ia": pd.Series([], dtype="int64"),
                             "ib": pd.Series([], dtype="int64"),
                             "n_users": pd.Series([], dtype="int64")})
    nodes_ref = ray.put(nodes)
    labels = nodes.copy()

    mst: list[tuple[int, int, int]] = []
    for _round in range(64):
        lab_ref = ray.put(labels)

        def cross(t: pa.Table, _n=nodes_ref, _l=lab_ref) -> pa.Table:
            nd = ray.get(_n)
            lb_arr = ray.get(_l)
            ia = t.column("ia").to_numpy(zero_copy_only=False)
            ib = t.column("ib").to_numpy(zero_copy_only=False)
            cnt = t.column("cnt").to_numpy(zero_copy_only=False)
            la = lb_arr[np.searchsorted(nd, ia)]
            lb = lb_arr[np.searchsorted(nd, ib)]
            m = la != lb
            ia, ib, cnt, la, lb = ia[m], ib[m], cnt[m], la[m], lb[m]
            return pa.table({
                "comp": pa.array(np.concatenate([la, lb]), pa.int64()),
                "cnt": pa.array(np.concatenate([cnt, cnt]), pa.int64()),
                "ia": pa.array(np.concatenate([ia, ia]), pa.int64()),
                "ib": pa.array(np.concatenate([ib, ib]), pa.int64())})

        def pick_min(t: pa.Table) -> pa.Table:
            comp = t.column("comp").to_numpy(zero_copy_only=False)
            if not len(comp):
                z = pa.array([], pa.int64())
                return pa.table({"comp": z, "cnt": z, "ia": z, "ib": z})
            cnt = t.column("cnt").to_numpy(zero_copy_only=False)
            ia = t.column("ia").to_numpy(zero_copy_only=False)
            ib = t.column("ib").to_numpy(zero_copy_only=False)
            order = np.lexsort((ib, ia, -cnt, comp))
            comp, cnt, ia, ib = (comp[order], cnt[order], ia[order],
                                 ib[order])
            first = segment_starts(comp)
            return pa.table({
                "comp": pa.array(comp[first], pa.int64()),
                "cnt": pa.array(cnt[first], pa.int64()),
                "ia": pa.array(ia[first], pa.int64()),
                "ib": pa.array(ib[first], pa.int64())})

        cand = map_key_partitions(
            edges.map_batches(cross, batch_format="pyarrow"),
            "comp", pick_min).take_all()
        if not cand:
            break

        # driver union-find over component minima (component-scale,
        # halving per round); min label becomes the root so labels stay
        # canonical-min like connected_components
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:
                parent[x], x = r, parent[x]
            return r

        nd_sorted = nodes
        lab_of = labels
        cand.sort(key=lambda r: (-int(r["cnt"]), int(r["ia"]),
                                 int(r["ib"])))
        for r in cand:
            ia_, ib_ = int(r["ia"]), int(r["ib"])
            la = int(lab_of[np.searchsorted(nd_sorted, ia_)])
            lb = int(lab_of[np.searchsorted(nd_sorted, ib_)])
            ra, rb = find(la), find(lb)
            if ra == rb:
                continue
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
            mst.append((ia_, ib_, int(r["cnt"])))

        # relabel: map each distinct label to its root, vectorized
        uniq = np.unique(labels)
        root = np.array([find(int(u)) for u in uniq], dtype=np.int64)
        labels = root[np.searchsorted(uniq, labels)]

    mst.sort()
    return pd.DataFrame({
        "ia": pd.Series([a for a, _, _ in mst], dtype="int64"),
        "ib": pd.Series([b for _, b, _ in mst], dtype="int64"),
        "n_users": pd.Series([c for _, _, c in mst], dtype="int64")})


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


def _textrank_sql(damping: float = 0.85, n_iter: int = 10) -> str:
    """q_page_rank's unrolled-CTE recurrence, restated over the word
    co-occurrence graph (term order r/ow*w matched so FP drift stays
    inside the 1e-8 rounding grain)."""
    sql = (
        "WITH toks AS MATERIALIZED (SELECT "
        "list_filter(regexp_split_to_array(lower(text), '\\s+'), "
        "w -> len(w) >= 4) AS ws FROM documents), "
        "adjp AS (SELECT u['a'] AS a, u['b'] AS b FROM ("
        "SELECT unnest([{'a': ws[i], 'b': ws[i+1]} "
        "for i in range(1, greatest(len(ws), 1))]) AS u FROM toks)), "
        "edges AS MATERIALIZED (SELECT src, dst, "
        "CAST(count(*) AS DOUBLE) AS w FROM ("
        "SELECT a AS src, b AS dst FROM adjp "
        "UNION ALL SELECT b, a FROM adjp) GROUP BY 1, 2), "
        "nodes AS (SELECT src AS node FROM edges "
        "UNION SELECT dst FROM edges), "
        "nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes), "
        "outw AS MATERIALIZED (SELECT src, sum(w) AS ow "
        "FROM edges GROUP BY 1), "
        "r0 AS (SELECT node, 1.0/(SELECT n FROM nv) AS r FROM nodes)")
    base_lit = repr(1.0 - damping)
    d_lit = repr(damping)
    for i in range(1, n_iter + 1):
        sql += (f", r{i} AS MATERIALIZED (SELECT n.node, "
                f"CAST({base_lit} AS DOUBLE)/(SELECT n FROM nv) + "
                f"{d_lit}*coalesce(c.s, 0) AS r FROM nodes n "
                f"LEFT JOIN (SELECT e.dst, sum(p.r / o.ow * e.w) AS s "
                f"FROM edges e JOIN outw o ON o.src = e.src "
                f"JOIN r{i-1} p ON p.node = e.src GROUP BY e.dst) c "
                f"ON c.dst = n.node)")
    sql += (f" SELECT node AS word, CAST(floor(r * 100000000 + 0.5) "
            f"AS BIGINT) AS pr_e8 FROM r{n_iter} "
            f"ORDER BY pr_e8 DESC, word LIMIT 20")
    return sql


def q_label_propagation(sf_dir: str):
    """Semi-supervised LABEL PROPAGATION over the cosine 5-NN embedding
    graph (Zhu & Ghahramani 2002 shape): vectors with vec_id % 5 == 0
    are seeds and keep their true label; every other vector recomputes,
    for 3 synchronous rounds, the majority label among its 5 nearest
    neighbors' previous-round labels (ties → smaller label; no labeled
    neighbor → unlabeled −1). kNN edges come from stages/ann.knn_edges:
    EXACT broadcast top-5 at oracle scale (≤4096 rows, rank-level float
    agreement with DuckDB's list_cosine_similarity, oracle-pinned) and
    the IVF-BUCKETED exchange above it — no corpus broadcast, FLOPs cut
    to ~nprobe/n_centroids of brute force, self-asserting sampled
    recall ≥ 0.9 vs exact brute force in the same run. Each round is a
    distributed vote — edge map + count combiner + per-vector majority
    exchange — with only the n-sized label vector crossing to the
    driver per round (the pagerank broadcast-mode policy; beyond
    ~millions of vectors switch the state to a Dataset and the update
    to a keyed join)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    from magic_content_extractor_ray.stages.ann import knn_edges
    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_starts)

    K, ROUNDS = 5, 3

    n_rows = pq.ParquetFile(
        f"{sf_dir}/embeddings.parquet").metadata.num_rows
    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"])
    edges = knn_edges(emb, k=K, n_rows=n_rows).materialize()

    lab_t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "label"]).sort_by("vec_id")
    all_ids = lab_t.column("vec_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    true_lab = lab_t.column("label").to_numpy(
        zero_copy_only=False).astype(np.int64)
    seed = (all_ids % 5) == 0
    labels = np.where(seed, true_lab, -1).astype(np.int64)

    for _r in range(ROUNDS):
        st_ref = ray.put(labels)

        def votes(t: pa.Table, _s=st_ref) -> pa.Table:
            lab = ray.get(_s)
            s = t.column("s").to_numpy(zero_copy_only=False)
            nt = t.column("t").to_numpy(zero_copy_only=False)
            tl = lab[np.searchsorted(all_ids, nt)]
            m = tl >= 0
            s, tl = s[m], tl[m]
            if not len(s):
                z = pa.array([], pa.int64())
                return pa.table({"s": z, "lbl": z, "c": z})
            pk = (s << np.int64(8)) | tl          # labels < 2^8
            u, cnt = np.unique(pk, return_counts=True)
            return pa.table({
                "s": pa.array(u >> np.int64(8), pa.int64()),
                "lbl": pa.array(u & np.int64(255), pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64())})

        counted = hash_agg(
            edges.map_batches(votes, batch_format="pyarrow"),
            "s", [("c", "sum", "c")], group_cols=["s", "lbl"])

        def majority(t: pa.Table) -> pa.Table:
            s = t.column("s").to_numpy(zero_copy_only=False)
            if not len(s):
                z = pa.array([], pa.int64())
                return pa.table({"s": z, "lbl": z})
            lbl = t.column("lbl").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            order = np.lexsort((lbl, -c, s))
            s, lbl = s[order], lbl[order]
            first = segment_starts(s)
            return pa.table({"s": pa.array(s[first], pa.int64()),
                             "lbl": pa.array(lbl[first], pa.int64())})

        win = map_key_partitions(counted, "s", majority).take_all()
        new = np.full(len(all_ids), -1, np.int64)
        for r in win:
            new[np.searchsorted(all_ids, int(r["s"]))] = int(r["lbl"])
        labels = np.where(seed, true_lab, new)

    return pd.DataFrame({
        "vec_id": pd.Series(all_ids, dtype="int64"),
        "pred_label": pd.Series(labels, dtype="int64"),
        "is_seed": pd.Series(seed.astype(np.int64), dtype="int64")})


def q_hard_negatives(sf_dir: str):
    """HARD-NEGATIVE mining for contrastive/metric learning: for every
    vector, the 2 most cosine-similar vectors with a DIFFERENT label —
    the pairs that matter for triplet-loss training, as opposed to
    q_negative_samples' random negatives. Same broadcast-matrix batch
    pass as mutual_nn (each vector's candidates decided in its own
    batch, rank-level float agreement with DuckDB's
    list_cosine_similarity); labels ride the broadcast so the
    different-label mask is applied BEFORE the top-k, not after (a
    post-filter could starve a vector surrounded by same-label
    neighbors)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import ray

    from magic_content_extractor_ray.stages.ann import (
        _batch_matrix, _normalize)

    K = 2

    full = pq.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"]
                         ).sort_by("vec_id")
    all_ids = full.column("vec_id").to_numpy(
        zero_copy_only=False).astype(np.int64)
    all_lab = full.column("label").to_numpy(
        zero_copy_only=False).astype(np.int64)
    qmat = _normalize(_batch_matrix(full, "embedding", np.float64))
    ref = ray.put({"ids": all_ids, "labels": all_lab, "matrix": qmat})

    class Hard:
        def __init__(self):
            q = ray.get(ref)
            self.ids, self.labels, self.mat = (q["ids"], q["labels"],
                                               q["matrix"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch.column("vec_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            blab = batch.column("label").to_numpy(
                zero_copy_only=False).astype(np.int64)
            m = _normalize(_batch_matrix(batch, "embedding",
                                         np.float64))
            sims = m @ self.mat.T
            same = blab[:, None] == self.labels[None, :]
            sims[same] = -np.inf                # mask before top-k
            top = np.argsort(-sims, axis=1, kind="stable")[:, :K]
            return pa.table({
                "vec_id": pa.array(np.repeat(bids, K), pa.int64()),
                "neg_rank": pa.array(np.tile(np.arange(K, dtype=np.int64),
                                             len(bids)), pa.int64()),
                "neg_id": pa.array(self.ids[top.ravel()], pa.int64())})

    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding", "label"])
    return emb.map_batches(Hard, batch_format="pyarrow",
                           batch_size=1024,
                           concurrency=(1, 8)).sort(["vec_id", "neg_rank"])


def q_dedup_safe_folds(sf_dir: str):
    """LEAKAGE-SAFE k-fold assignment: exact-duplicate clusters (md5 of
    text, the dedup_exact universe) are assigned to folds as WHOLE
    units — fold = md5(cluster:fold) % 5 of the cluster id, never the
    doc id — so no duplicate pair ever straddles a train/validation
    boundary (the eval-hygiene rule exact n-gram decontamination
    enforces after the fact, applied at split time instead). One
    exchange on the content hash (min doc id per segment becomes the
    cluster id for every member), fold draw is the seeded-md5 idiom."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from magic_content_extractor_ray.stages.dedup import add_text_hash
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        h = add_text_hash(t)
        return pa.table({"h": h.column("text_hash"),
                         "doc_id": h.column("doc_id")})

    def clusters(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False)
        if not len(h):
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "cluster_id": z, "fold": z})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        starts = segment_starts(h)
        lens = segment_lengths(starts, len(h))
        # sorted by (h, doc_id): segment head is the min doc id
        cluster = np.repeat(ids[starts], lens)
        folds = np.empty(len(starts), np.int64)
        for i, c in enumerate(ids[starts]):
            folds[i] = int(hashlib.md5(
                f"{c}:fold".encode()).hexdigest()[:8], 16) % 5
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "cluster_id": pa.array(cluster, pa.int64()),
            "fold": pa.array(np.repeat(folds, lens), pa.int64())})

    out = map_key_partitions(docs.map_batches(keyed,
                                              batch_format="pyarrow"),
                             "h", clusters, sort_cols=["doc_id"])
    return out.sort("doc_id")


def q_quantile_normalize(sf_dir: str):
    """Cross-source QUANTILE NORMALIZATION of doc length (the
    batch-effect correction that makes per-source quality scores
    comparable before mixing): each doc's within-source rank r of n_s
    maps to the GLOBAL value at rank ⌊r·(N−1)/(n_s−1)⌋ — all-integer
    index arithmetic, so there is no float interpolation to disagree
    on (singleton sources map to the global median index (N−1)//2).
    Shape: one per-source rank exchange (map_key_partitions), one
    global 0-based rank via the two-phase scan (keyed_prefix_sum with
    value=1 — nothing driver-sized beyond the bucket prefix table),
    and one hash_join of target indices against global ranks."""
    import numpy as np
    import pyarrow as pa

    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "source", "n_chars"])
    n_total = docs.count()

    def src_ranks(t: pa.Table) -> pa.Table:
        s = t.column("source").to_numpy(zero_copy_only=False)
        if not len(s):
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "source": pa.array([],
                                                             pa.string()),
                             "n_chars": z, "idx": z})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        nc = t.column("n_chars").to_numpy(zero_copy_only=False)
        starts = segment_starts(s)
        lens = segment_lengths(starts, len(s))
        r = np.arange(len(s), dtype=np.int64) - np.repeat(starts, lens)
        ns = np.repeat(lens, lens)
        idx = np.where(ns == 1, (n_total - 1) // 2,
                       (r * (n_total - 1)) // np.maximum(ns - 1, 1))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(s, pa.string()),
            "n_chars": pa.array(nc.astype(np.int64), pa.int64()),
            "idx": pa.array(idx.astype(np.int64), pa.int64())})

    ranked = map_key_partitions(docs, "source", src_ranks,
                                sort_cols=["n_chars", "doc_id"])

    ones = docs.map_batches(
        lambda t: pa.table({
            "n_chars": t.column("n_chars"),
            "doc_id": t.column("doc_id"),
            "one": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow")
    g = keyed_prefix_sum(ones, key_column="n_chars", value_column="one",
                         tie_column="doc_id", out_column="gr")
    import pyarrow.compute as pc

    gvals = g.map_batches(
        lambda t: pa.table({
            "idx": pc.cast(t.column("gr"), pa.int64()),
            "normalized_chars": pc.cast(t.column("n_chars"),
                                        pa.int64())}),
        batch_format="pyarrow")

    out = hash_join(
        ranked, gvals, key="idx",
        left_cols=["doc_id", "source", "n_chars"],
        right_cols=["normalized_chars"], how="inner",
        left_types={"idx": pa.int64(), "doc_id": pa.int64(),
                    "source": pa.string(), "n_chars": pa.int64()},
        right_types={"idx": pa.int64(), "normalized_chars": pa.int64()})
    return out.map_batches(
        lambda t: t.select(["doc_id", "source", "n_chars",
                            "normalized_chars"]),
        batch_format="pyarrow").sort("doc_id")


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


def q_hbos_outliers(sf_dir: str):
    """HBOS anomaly scoring over the embedding cloud (Goldstein &
    Dengel 2012 — the histogram-based outlier detector production
    pipelines run because it's one pass and embarrassingly parallel):
    per dimension, 10 equal-width bins between the corpus min/max;
    score(v) = Σ_d ln(N / count[d, bin_d(v)]), computed as per-(d,bin)
    nano-nat integer TERMS (one ln per cell, rounded before any sum —
    the nano-nat idiom, so the SQL twin sums the identical integers).
    Bin assignment is pure IEEE double arithmetic in the same operation
    order both sides. Three streaming passes (min/max partials → 640
    bin-count cells → scores + per-batch top-k); driver state is the
    64-row min/max table and the 640-cell histogram, never rows.
    Top-20 by (score desc, vec_id asc)."""
    import numpy as np
    import pyarrow as pa

    import ray

    DIM, BINS, K = 64, 10, 20

    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"])

    def mat_of(batch: pa.Table) -> np.ndarray:
        return np.stack(batch.column("embedding").to_numpy(
            zero_copy_only=False)).astype(np.float64)

    def minmax(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            z64 = pa.array([], pa.int64())
            zf = pa.array([], pa.float64())
            return pa.table({"d": z64, "mn": zf, "mx": zf, "n": z64})
        m = mat_of(batch)
        return pa.table({
            "d": pa.array(np.arange(DIM, dtype=np.int64), pa.int64()),
            "mn": pa.array(m.min(axis=0), pa.float64()),
            "mx": pa.array(m.max(axis=0), pa.float64()),
            "n": pa.array(np.full(DIM, len(m), np.int64), pa.int64())})

    parts = emb.map_batches(minmax, batch_format="pyarrow").take_all()
    mn = np.full(DIM, np.inf)
    mx = np.full(DIM, -np.inf)
    n_total = 0
    seen = set()
    for r in parts:
        d = int(r["d"])
        mn[d] = min(mn[d], float(r["mn"]))
        mx[d] = max(mx[d], float(r["mx"]))
        # n repeats per dim; count each batch once (dim 0 rows)
        if d == 0:
            n_total += int(r["n"])

    def bins_of(m: np.ndarray) -> np.ndarray:
        span = mx - mn
        with np.errstate(divide="ignore", invalid="ignore"):
            b = np.floor((m - mn[None, :]) * float(BINS) / span[None, :])
        b = np.where(span[None, :] == 0, 0, b)
        return np.minimum(BINS - 1, b).astype(np.int64)

    mm_ref = ray.put({"mn": mn, "mx": mx})

    def cells(batch: pa.Table, _r=mm_ref) -> pa.Table:
        if len(batch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"cell": z, "c": z})
        m = mat_of(batch)
        b = bins_of(m)
        flat = (np.arange(DIM, dtype=np.int64)[None, :] * BINS +
                b).ravel()
        c = np.bincount(flat, minlength=DIM * BINS).astype(np.int64)
        return pa.table({
            "cell": pa.array(np.arange(DIM * BINS, dtype=np.int64),
                             pa.int64()),
            "c": pa.array(c, pa.int64())})

    counts = np.zeros(DIM * BINS, np.int64)
    for r in emb.map_batches(cells, batch_format="pyarrow").take_all():
        counts[int(r["cell"])] += int(r["c"])

    term = np.zeros(DIM * BINS, np.int64)
    nz = counts > 0
    term[nz] = np.floor(
        np.log(float(n_total) / counts[nz].astype(np.float64)) * 1e9
        + 0.5).astype(np.int64)
    term_ref = ray.put(term)

    def score(batch: pa.Table, _t=term_ref) -> pa.Table:
        if len(batch) == 0:
            z = pa.array([], pa.int64())
            return pa.table({"vec_id": z, "hbos_nano": z})
        tm = ray.get(_t)
        m = mat_of(batch)
        b = bins_of(m)
        flat = np.arange(DIM, dtype=np.int64)[None, :] * BINS + b
        sc = tm[flat].sum(axis=1)
        ids = batch.column("vec_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, -sc))[:K]     # per-batch top-k pruning
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "hbos_nano": pa.array(sc[order], pa.int64())})

    return emb.map_batches(score, batch_format="pyarrow").sort(
        ["hbos_nano", "vec_id"], descending=[True, False]).limit(K)


def q_conformal_interval(sf_dir: str):
    """SPLIT CONFORMAL prediction intervals for doc length per language
    (Vovk et al. / the distribution-free calibration recipe): docs with
    even ids calibrate, odd ids test. Center = calibration lower
    median; nonconformity s = |n_chars − med|; q̂ = the
    min(n, ⌈0.9·(n+1)⌉)-th smallest calibration score — the exact
    finite-sample 90% guarantee, computed with the all-integer
    ⌈9(n+1)/10⌉ = (9(n+1)+9)//10 formula; coverage = test docs inside
    [med−q̂, med+q̂]. Everything runs on the per-(lang, split, value)
    HISTOGRAM (the exact grouped-quantile value-histogram policy:
    partition state is O(distinct lengths), never rows), one combiner
    pass + one keyed exchange."""
    import numpy as np
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = t.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        lang = t.column("lang").to_numpy(zero_copy_only=False)
        out = pa.table({
            "lang": pa.array(lang, pa.string()),
            "split": pa.array(ids % 2, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "c": pa.array(np.ones(len(v), np.int64), pa.int64())})
        return out.group_by(["lang", "split", "v"]).aggregate(
            [("c", "sum")]).rename_columns(["lang", "split", "v", "c"])

    hist = hash_agg(docs.map_batches(prep, batch_format="pyarrow"),
                    "lang", [("c", "sum", "c")],
                    group_cols=["lang", "split", "v"])

    def per_lang(t: pa.Table) -> pa.Table:
        langs = t.column("lang").to_numpy(zero_copy_only=False)
        out = {"lang": [], "n_cal": [], "n_test": [], "med": [],
               "qhat": [], "n_covered": []}
        if len(langs):
            sp = t.column("split").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            for lg in np.unique(langs):
                m = langs == lg
                cal = m & (sp == 0)
                tst = m & (sp == 1)
                if not cal.any():
                    continue
                cv, cc = v[cal], c[cal]
                o = np.argsort(cv, kind="stable")
                cv, cc = cv[o], cc[o]
                cum = np.cumsum(cc)
                n = int(cum[-1])
                med = int(cv[np.searchsorted(cum, (n - 1) // 2 + 1)])
                s = np.abs(cv - med)
                so = np.argsort(s, kind="stable")
                s, sc_ = s[so], cc[so]
                scum = np.cumsum(sc_)
                k = min(n, (9 * (n + 1) + 9) // 10)
                qhat = int(s[np.searchsorted(scum, k)])
                tv, tc = v[tst], c[tst]
                n_test = int(tc.sum())
                covered = int(tc[np.abs(tv - med) <= qhat].sum())
                out["lang"].append(str(lg))
                out["n_cal"].append(n)
                out["n_test"].append(n_test)
                out["med"].append(med)
                out["qhat"].append(qhat)
                out["n_covered"].append(covered)
        return pa.table({
            "lang": pa.array(out["lang"], pa.string()),
            "n_cal": pa.array(out["n_cal"], pa.int64()),
            "n_test": pa.array(out["n_test"], pa.int64()),
            "med": pa.array(out["med"], pa.int64()),
            "qhat": pa.array(out["qhat"], pa.int64()),
            "n_covered": pa.array(out["n_covered"], pa.int64())})

    return map_key_partitions(hist, "lang", per_lang).sort("lang")


def q_token_waterfill(sf_dir: str):
    """WATER-FILLING token budget allocation across sources (the data-
    mixing step that caps over-represented sources so a 50%-of-corpus
    budget is spent as evenly as possible): water level T* = the max
    integer with Σ min(nᵢ, T) ≤ B, found over the exact candidate set
    {nᵢ} ∪ {(B − P_{k−1}) // (m−k+1)} (P = ascending prefix sums);
    the L = B − Σ min(nᵢ, T*) leftover tokens go one each to the L
    largest sources above the level, ordered (n desc, source asc) —
    all integer arithmetic, no float water level. The corpus-scale
    part is the token count (one tokenize-combiner pass); the m-source
    optimization is driver-side on an m-row aggregate."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_sum

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["source", "text"])

    def counts(t: pa.Table) -> pa.Table:
        nt = pc.cast(pc.count_substring_regex(
            t.column("text"), pattern=r"\S+"), pa.int64())
        out = pa.table({"source": t.column("source"), "nt": nt})
        return out.group_by(["source"]).aggregate(
            [("nt", "sum")]).rename_columns(["source", "nt"])

    per_src = hash_sum(docs.map_batches(counts, batch_format="pyarrow"),
                       "source", "nt", "n_tokens").to_pandas()
    per_src = per_src.sort_values("source").reset_index(drop=True)
    n = per_src["n_tokens"].to_numpy().astype(np.int64)
    srcs = per_src["source"].to_numpy()
    total = int(n.sum())
    B = total // 2
    m = len(n)

    order = np.lexsort((srcs, n))            # ascending (n, source)
    ns = n[order]
    prefix = np.concatenate([[0], np.cumsum(ns)[:-1]])
    cands = set(int(x) for x in ns)
    for k in range(m):
        rem = m - k
        cands.add(max(0, (B - int(prefix[k])) // rem))

    def f(T: int) -> int:
        return int(np.minimum(n, T).sum())

    tstar = max((T for T in cands if f(T) <= B), default=0)
    base = np.minimum(n, tstar)
    L = B - int(base.sum())
    above = n > tstar
    bonus = np.zeros(m, np.int64)
    if L > 0 and above.any():
        pri = np.lexsort((srcs, -n))         # (n desc, source asc)
        pri = [i for i in pri if above[i]][:L]
        bonus[pri] = 1
    return pd.DataFrame({
        "source": srcs,
        "n_tokens": pd.Series(n, dtype="int64"),
        "alloc": pd.Series(base + bonus, dtype="int64")}).sort_values(
        "source").reset_index(drop=True)


def q_mmr_select(sf_dir: str):
    """MMR diverse re-ranking over SQ8 codes (λ = 1/2): query = lowest
    vec_id; greedy relevance-minus-redundancy picks on the exact
    integer squared-L2 scale (stages/ann.mmr_select — kcenter_select's
    execution shape with a marginal-relevance objective)."""
    from magic_content_extractor_ray.stages.ann import mmr_select

    emb = _read_pq(f"{sf_dir}/embeddings.parquet",
                   columns=["vec_id", "embedding"])
    return mmr_select(emb, k=8)


def _mmr_oracle(k: int = 8) -> str:
    """Unrolled greedy MMR twin (the _kcenter_oracle pattern): round
    1 = argmin distance-to-query; round i = argmax (min-dist-to-chosen
    − dist-to-query), ties vec_id asc, chosen + query excluded."""
    parts = [
        _SQ8_CODES_SQL,
        ", codes AS MATERIALIZED (SELECT vec_id, ex.dim, CASE WHEN mx = mn THEN 0 "
        "ELSE CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT) END "
        "AS code FROM ex JOIN grid ON grid.dim = ex.dim), "
        "qq AS MATERIALIZED (SELECT min(vec_id) AS qid FROM codes), "
        "dq AS MATERIALIZED (SELECT c.vec_id, CAST(sum((c.code - x.code) * "
        "(c.code - x.code)) AS BIGINT) AS dq FROM codes c JOIN codes x "
        "ON x.dim = c.dim AND x.vec_id = (SELECT qid FROM qq) "
        "GROUP BY 1), "
        "m1 AS MATERIALIZED (SELECT vec_id, -dq AS sc FROM dq "
        "WHERE vec_id <> (SELECT qid FROM qq) "
        "ORDER BY sc DESC, vec_id LIMIT 1), "
        "d1 AS MATERIALIZED (SELECT c.vec_id, CAST(sum((c.code - x.code) * "
        "(c.code - x.code)) AS BIGINT) AS d FROM codes c JOIN codes x "
        "ON x.dim = c.dim AND x.vec_id = (SELECT vec_id FROM m1) "
        "GROUP BY 1)"]
    for i in range(2, k + 1):
        excl = " UNION ALL ".join(
            f"SELECT vec_id FROM m{j}" for j in range(1, i))
        parts.append(
            f", m{i} AS MATERIALIZED (SELECT p.vec_id, p.d - q.dq AS sc "
            f"FROM d{i-1} p JOIN dq q ON q.vec_id = p.vec_id "
            f"WHERE p.vec_id <> (SELECT qid FROM qq) "
            f"AND p.vec_id NOT IN ({excl}) "
            f"ORDER BY sc DESC, p.vec_id LIMIT 1)")
        if i < k:
            parts.append(
                f", d{i} AS MATERIALIZED (SELECT p.vec_id, LEAST(p.d, s.d) AS d "
                f"FROM d{i-1} p JOIN (SELECT c.vec_id, "
                f"CAST(sum((c.code - x.code) * (c.code - x.code)) "
                f"AS BIGINT) AS d FROM codes c JOIN codes x "
                f"ON x.dim = c.dim AND x.vec_id = "
                f"(SELECT vec_id FROM m{i}) GROUP BY 1) s "
                f"ON s.vec_id = p.vec_id)")
    parts.append(
        " SELECT CAST(1 AS BIGINT) AS round, vec_id, "
        "CAST(sc AS BIGINT) AS score2 FROM m1")
    for i in range(2, k + 1):
        parts.append(f" UNION ALL SELECT {i}, vec_id, sc FROM m{i}")
    parts.append(" ORDER BY round")
    return "".join(parts)


def q_length_emd(sf_dir: str):
    """Pairwise 1-D WASSERSTEIN (earth-mover) distance between the
    per-source doc-length distributions — the drift metric that, unlike
    KL/KS (source_drift_kl, source_ks), weights HOW FAR mass moved:
    W₁ = ∫|F_a − F_b| dx, computed EXACTLY on the value histogram as
    Σ |cumA·n_b − cumB·n_a| · gap (one integer per value gap — the
    common-denominator n_a·n_b trick, no float CDFs; fits int64 while
    n_a·n_b·range < 2⁶³ — beyond that, switch the accumulator to
    Python ints like embedding_covariance). Shape: one (source, value)
    histogram combiner, histogram rows replicated to the O(m²) pair
    keys (m = #sources, dimension-sized), one keyed exchange where each
    pair's partition runs a vectorized two-CDF sweep."""
    import numpy as np
    import pyarrow as pa

    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["source", "n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = pa.table({
            "source": t.column("source"),
            "v": pc.cast(t.column("n_chars"), pa.int64()),
            "c": pa.array(np.ones(len(t), np.int64), pa.int64())})
        return out.group_by(["source", "v"]).aggregate(
            [("c", "sum")]).rename_columns(["source", "v", "c"])

    hist = hash_agg(docs.map_batches(pre, batch_format="pyarrow"),
                    "source", [("c", "sum", "c")],
                    group_cols=["source", "v"]).materialize()

    srcs = sorted({r["source"] for r in hist.map_batches(
        lambda t: pa.table({"source": t.column("source")}),
        batch_format="pyarrow").take_all()})
    m = len(srcs)
    idx = {s: i for i, s in enumerate(srcs)}
    src_ref = ray.put(srcs)

    def replicate(t: pa.Table) -> pa.Table:
        s = t.column("source").to_numpy(zero_copy_only=False)
        v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        si = np.array([idx[x] for x in s], dtype=np.int64)
        pk, vv, cc, side = [], [], [], []
        for j in range(m):
            lo = np.minimum(si, j)
            hi = np.maximum(si, j)
            keep = si != j
            pk.append((lo[keep] * m + hi[keep]))
            vv.append(v[keep])
            cc.append(c[keep])
            side.append((si[keep] < j).astype(np.int64))  # 0 = a side
        return pa.table({
            "pk": pa.array(np.concatenate(pk), pa.int64()),
            "v": pa.array(np.concatenate(vv), pa.int64()),
            "c": pa.array(np.concatenate(cc), pa.int64()),
            "side": pa.array(np.concatenate(side), pa.int64())})

    pairs = hist.map_batches(replicate, batch_format="pyarrow")

    def sweep(t: pa.Table, _s=src_ref) -> pa.Table:
        names = ray.get(_s)
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        out = {"source_a": [], "source_b": [], "n_a": [], "n_b": [],
               "w1_num": []}
        if len(pk):
            v = t.column("v").to_numpy(zero_copy_only=False)
            c = t.column("c").to_numpy(zero_copy_only=False)
            sd = t.column("side").to_numpy(zero_copy_only=False)
            for key in np.unique(pk):
                mk = pk == key
                vv, cc, ss = v[mk], c[mk], sd[mk]
                o = np.lexsort((ss, vv))
                vv, cc, ss = vv[o], cc[o], ss[o]
                ca = np.cumsum(np.where(ss == 0, cc, 0))
                cb = np.cumsum(np.where(ss == 1, cc, 0))
                na, nb = int(ca[-1]), int(cb[-1])
                # collapse duplicate values: keep last row per value
                last = np.r_[vv[1:] != vv[:-1], True]
                vv2, ca2, cb2 = vv[last], ca[last], cb[last]
                gap = vv2[1:] - vv2[:-1]
                w1 = int(np.abs(ca2[:-1] * nb - cb2[:-1] * na)
                         .astype(np.int64) @ gap.astype(np.int64))
                ia, ib = int(key) // len(names), int(key) % len(names)
                out["source_a"].append(names[ia])
                out["source_b"].append(names[ib])
                out["n_a"].append(na)
                out["n_b"].append(nb)
                out["w1_num"].append(w1)
        return pa.table({
            "source_a": pa.array(out["source_a"], pa.string()),
            "source_b": pa.array(out["source_b"], pa.string()),
            "n_a": pa.array(out["n_a"], pa.int64()),
            "n_b": pa.array(out["n_b"], pa.int64()),
            "w1_num": pa.array(out["w1_num"], pa.int64())})

    return map_key_partitions(pairs, "pk", sweep).sort(
        ["source_a", "source_b"])


def q_isotonic_calibration(sf_dir: str):
    """ISOTONIC (PAV) calibration of the decile curve: the
    non-decreasing purchase-rate fit over q_score_calibration's 10
    NTILE bins, via the exact minimax identity
    ŷᵢ = max_{j≤i} min_{k≥i} avg(y over bins j..k). Window averages
    are floored to integer ppm FIRST — floor is monotone, so
    minimax-of-floors ≡ floor(true PAV value) exactly (proved by the
    exact-fraction PAV differential in tests). The corpus-scale work
    is the decile pipeline (two-phase prefix-sum ranks); the 55-window
    minimax runs on the 10-row aggregate driver-side."""
    import numpy as np
    import pandas as pd

    base = q_score_calibration(sf_dir)
    if hasattr(base, "to_pandas"):
        base = base.to_pandas()
    base = base.sort_values("bin").reset_index(drop=True)
    n = base["n"].to_numpy().astype(np.int64)
    pos = base["n_pos"].to_numpy().astype(np.int64)
    m = len(n)
    cp = np.concatenate([[0], np.cumsum(pos)])
    cn = np.concatenate([[0], np.cumsum(n)])

    def win(j, k):          # ppm-floored window average, bins j..k
        return (1_000_000 * int(cp[k + 1] - cp[j])) \
            // int(cn[k + 1] - cn[j])

    iso = np.empty(m, np.int64)
    for i in range(m):
        best = None
        for j in range(i + 1):
            mn = min(win(j, k) for k in range(i, m))
            best = mn if best is None else max(best, mn)
        iso[i] = best
    return pd.DataFrame({
        "bin": base["bin"].astype("int64"),
        "n": base["n"].astype("int64"),
        "n_pos": base["n_pos"].astype("int64"),
        "iso_ppm": pd.Series(iso, dtype="int64")})


def q_curriculum_order(sf_dir: str):
    """CURRICULUM data ordering (easy→hard with per-source
    interleaving): docs are NTILE(10)-bucketed by length (exact SQL
    NTILE semantics — first n%10 deciles take the extra row), ranked
    within (decile, source), and the final training position orders by
    (decile, within-rank, source) — so consecutive positions cycle
    round-robin across sources inside each difficulty bucket instead
    of streaming one source at a time (the mixing property curriculum
    schedules need). Three exchanges, all integer: a two-phase
    prefix-sum global rank for the deciles, one keyed exchange for
    within-(decile, source) ranks, and a second prefix-sum over the
    packed (decile, rank, source) key for the global position — no
    global sort materializes anywhere."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    import ray

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "source", "n_chars"])
    n_total = docs.count()
    q, r = divmod(n_total, 10)

    srcs = sorted({x["source"] for x in docs.map_batches(
        lambda t: pa.table({"source": t.column("source")}),
        batch_format="pyarrow").groupby("source").count().take_all()})
    sidx = {s: i for i, s in enumerate(srcs)}
    m = len(srcs)

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": pc.cast(t.column("n_chars"), pa.int64()),
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "source": t.column("source"),
            "one": pa.array(np.ones(len(t), np.int64))})

    ranked = keyed_prefix_sum(
        docs.map_batches(prep, batch_format="pyarrow"),
        key_column="v", value_column="one", tie_column="doc_id",
        out_column="rk", bucket_width=256)

    def decile_key(df: pd.DataFrame) -> pd.DataFrame:
        rank = df["rk"].to_numpy(dtype="int64") + 1       # 1-based
        cut = r * (q + 1)
        first = rank <= cut
        dec = np.where(first, 1 + (rank - 1) // max(q + 1, 1),
                       1 + r + (rank - cut - 1) // max(q, 1)) \
            .astype(np.int64)
        si = df["source"].map(sidx).to_numpy(dtype="int64")
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "v": df["v"].astype("int64"),
            "ds": dec * m + si,
            "decile": dec})
        return out

    keyed = ranked.map_batches(decile_key, batch_format="pandas")

    def within_rank(t: pa.Table) -> pa.Table:
        ds_ = t.column("ds").to_numpy(zero_copy_only=False)
        if not len(ds_):
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z, "decile": z, "pk": z,
                             "one": z})
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        dec = t.column("decile").to_numpy(zero_copy_only=False)
        starts = segment_starts(ds_)
        lens = segment_lengths(starts, len(ds_))
        rr = np.arange(len(ds_), dtype=np.int64) - \
            np.repeat(starts, lens)
        si = ds_ - dec * m
        pk = (dec << np.int64(46)) | (rr << np.int64(6)) | si
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "decile": pa.array(dec, pa.int64()),
            "pk": pa.array(pk, pa.int64()),
            "one": pa.array(np.ones(len(ds_), np.int64), pa.int64())})

    wr = map_key_partitions(keyed, "ds", within_rank,
                            sort_cols=["v", "doc_id"])

    pos = keyed_prefix_sum(wr, key_column="pk", value_column="one",
                           out_column="position",
                           bucket_width=1 << 46)
    return pos.map_batches(
        lambda df: df[["doc_id", "decile", "position"]].astype("int64"),
        batch_format="pandas").sort("doc_id")


def q_padding_waste(sf_dir: str):
    """PADDING-WASTE accounting for fixed-size training batches (the
    systems argument for length-bucketed batching): batches of 16 and
    64 docs are formed in doc_id order ('random') and in
    (n_chars, doc_id) order ('sorted'); every batch pads to its max
    length, waste_ppm = 10⁶·(padded − real) // padded. All integers:
    batch ids come from the two-phase prefix-sum rank (rank // b), the
    per-batch (rows, max, sum) reduce is one combiner groupby per
    configuration — no global sort is materialized."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import hash_agg

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "v": pc.cast(t.column("n_chars"), pa.int64()),
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "one": pa.array(np.ones(len(t), np.int64))})

    base = docs.map_batches(prep, batch_format="pyarrow")
    rows = []
    for ordering, key, tie, width in (
            ("random", "doc_id", None, 100_000),
            ("sorted", "v", "doc_id", 256)):
        ranked = keyed_prefix_sum(base, key_column=key,
                                  value_column="one", tie_column=tie,
                                  out_column="rk", bucket_width=width)
        for b in (16, 64):
            def tag(df: pd.DataFrame, _b=b) -> pd.DataFrame:
                return pd.DataFrame({
                    "bid": df["rk"].to_numpy(dtype="int64") // _b,
                    "v": df["v"].astype("int64"),
                    "one": np.ones(len(df), np.int64)})

            agg = hash_agg(
                ranked.map_batches(tag, batch_format="pandas"),
                "bid", [("one", "sum", "rows"), ("v", "max", "mx"),
                        ("v", "sum", "sv")]).to_pandas()
            padded = int((agg["rows"].astype("int64")
                          * agg["mx"].astype("int64")).sum())
            real = int(agg["sv"].sum())
            rows.append({
                "ordering": ordering, "batch_size": b,
                "n_batches": len(agg),
                "waste_ppm": (1_000_000 * (padded - real)) // padded})
    return pd.DataFrame(rows).astype(
        {"batch_size": "int64", "n_batches": "int64",
         "waste_ppm": "int64"}).sort_values(
        ["ordering", "batch_size"]).reset_index(drop=True)


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


def q_clustering_coefficient(sf_dir: str):
    """GLOBAL CLUSTERING COEFFICIENT (transitivity) of the co-view item
    graph: 3·triangles / wedges. Triangle participation comes from the
    q_item_triangles pipeline (min-vertex wedge generation + edge-set
    hash join; Σ participation = 3T exactly); wedges are Σ d(d−1)/2
    over node degrees (one keyed segment-length pass, mergeable int
    partials). Output is one row of exact integers + floor-ppm ratio."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    tri = q_item_triangles(sf_dir)
    if hasattr(tri, "to_pandas"):
        tri = tri.to_pandas()
    s = int(tri["n_triangles"].sum())        # = 3T

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= 2)

    def symmetrize(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        a = pk >> np.int64(31)
        b = pk & np.int64((1 << 31) - 1)
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    def wedge_partial(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False)
        if not len(node):
            return pa.table({"w": pa.array([], pa.int64())})
        starts = segment_starts(node)
        lens = segment_lengths(starts, len(node))
        return pa.table({"w": pa.array(
            [int((lens * (lens - 1) // 2).sum())], pa.int64())})

    parts = map_key_partitions(
        edges.map_batches(symmetrize, batch_format="pyarrow"),
        "node", wedge_partial).take_all()
    w = sum(int(r["w"]) for r in parts)
    return pd.DataFrame([{
        "n_triangles": s // 3,
        "n_wedges": w,
        "cc_ppm": (1_000_000 * s) // w if w else 0}]).astype("int64")


def q_markov_stationary(sf_dir: str):
    """STATIONARY DISTRIBUTION of the per-user event-type Markov chain
    by integer matrix squaring (the q_pca_power idiom on a 5×5 chain):
    transition counts come from one keyed exchange (consecutive events
    per user in (ts, event_id) order — the page_rank edge pass); the
    row-stochastic matrix is quantized to a 10⁶ grid with
    round-half-away and squared 10 times (effective power 2¹⁰ — mixing
    drives every row to the stationary vector), all in exact int64, so
    the unrolled-CTE SQL twin reproduces the estimate bit-for-bit.
    Output: (event_type, pi_micro) — row 0 of the squared matrix."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        col_np, hash_agg, map_key_partitions)

    TYPES = ["click", "error", "purchase", "signup", "view"]
    K, SCALE, SQ = len(TYPES), 1_000_000, 10

    def with_t(batch: pa.Table) -> pa.Table:
        idx = pc.index_in(batch.column("event_type"),
                          value_set=pa.array(TYPES))
        return pa.table({"user_id": batch.column("user_id"),
                         "ts": batch.column("ts"),
                         "event_id": batch.column("event_id"),
                         "t": pc.cast(idx, pa.int64())})

    def edges(t: pa.Table) -> pa.Table:
        uid = col_np(t, "user_id")
        tt = col_np(t, "t")
        same = uid[1:] == uid[:-1]
        pk = tt[:-1][same] * K + tt[1:][same]
        u, c = np.unique(pk, return_counts=True)
        return pa.table({"pk": pa.array(u, pa.int64()),
                         "c": pa.array(c.astype(np.int64), pa.int64())})

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["user_id", "ts", "event_id", "event_type"])
    trans = hash_agg(
        map_key_partitions(ev.map_batches(with_t,
                                          batch_format="pyarrow"),
                           "user_id", edges,
                           sort_cols=["ts", "event_id"]),
        "pk", [("c", "sum", "c")]).take_all()

    cnt = [[0] * K for _ in range(K)]
    for r in trans:
        cnt[int(r["pk"]) // K][int(r["pk"]) % K] = int(r["c"])

    def rnd(x: int, den: int) -> int:
        ax = (2 * abs(x) * SCALE + den) // (2 * den)
        return ax if x >= 0 else -ax

    p = [[(rnd(cnt[i][j], sum(cnt[i])) if sum(cnt[i]) else
           (SCALE if i == j else 0)) for j in range(K)]
         for i in range(K)]
    for _ in range(SQ):
        w = [[sum(p[i][k] * p[k][j] for k in range(K))
              for j in range(K)] for i in range(K)]
        m2 = max(abs(w[i][j]) for i in range(K) for j in range(K))
        if m2 == 0:
            p = w
            break
        # renormalize each ROW to the 1e6 grid (stochasticity, not max)
        p = [[rnd(w[i][j], sum(w[i])) if sum(w[i]) else 0
              for j in range(K)] for i in range(K)]
    return pd.DataFrame({
        "event_type": TYPES,
        "pi_micro": pd.Series(p[0], dtype="int64")})


def _markov_stationary_oracle(squarings: int = 10) -> str:
    """Unrolled integer matrix-squaring twin of q_markov_stationary
    (row-stochastic renormalization each round; HUGEINT throughout —
    2·w·10⁶ exceeds int64). Every CTE MATERIALIZED (DuckDB inlines
    plain CTEs; chained self-joins explode otherwise)."""
    RND = ("CASE WHEN rs.rs = 0 THEN 0 ELSE "
           "(2 * w.w * 1000000 + rs.rs) // (2 * rs.rs) END")
    parts = [
        "WITH seq AS MATERIALIZED (SELECT user_id, "
        "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END AS t, "
        "LEAD(CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS nt "
        "FROM events), "
        "ct AS MATERIALIZED (SELECT t AS i, nt AS j, "
        "CAST(count(*) AS HUGEINT) AS c FROM seq "
        "WHERE nt IS NOT NULL GROUP BY 1, 2), "
        "grid AS (SELECT a.i AS i, b.i AS j FROM range(5) a(i), "
        "range(5) b(i)), "
        "full0 AS MATERIALIZED (SELECT g.i, g.j, "
        "COALESCE(ct.c, 0) AS c FROM grid g LEFT JOIN ct "
        "ON ct.i = g.i AND ct.j = g.j), "
        "rs0 AS MATERIALIZED (SELECT i, sum(c) AS rs FROM full0 "
        "GROUP BY 1), "
        "c0 AS MATERIALIZED (SELECT w.i, w.j, CASE WHEN rs.rs = 0 THEN "
        "(CASE WHEN w.i = w.j THEN 1000000 ELSE 0 END) ELSE "
        "(2 * w.c * 1000000 + rs.rs) // (2 * rs.rs) END AS p "
        "FROM full0 w JOIN rs0 rs ON rs.i = w.i)"]
    for k in range(1, squarings + 1):
        parts.append(
            f", w{k} AS MATERIALIZED (SELECT a.i AS i, b.j AS j, "
            f"sum(a.p * b.p) AS w FROM c{k-1} a JOIN c{k-1} b "
            f"ON a.j = b.i GROUP BY 1, 2)"
            f", rs{k} AS MATERIALIZED (SELECT i, sum(w) AS rs "
            f"FROM w{k} GROUP BY 1)"
            f", c{k} AS MATERIALIZED (SELECT w.i, w.j, "
            + RND.replace("w.w", "w.w").replace("rs.rs", "rs.rs")
            + f" AS p FROM w{k} w JOIN rs{k} rs ON rs.i = w.i)")
    parts.append(
        f" SELECT CASE j WHEN 0 THEN 'click' WHEN 1 THEN 'error' "
        f"WHEN 2 THEN 'purchase' WHEN 3 THEN 'signup' ELSE 'view' END "
        f"AS event_type, CAST(p AS BIGINT) AS pi_micro "
        f"FROM c{squarings} WHERE i = 0 ORDER BY j")
    return "".join(parts)


def q_join_cardinality_model(sf_dir: str):
    """Query-planner JOIN CARDINALITY model audit: the textbook
    uniform-frequency estimate |R ⋈ S| ≈ |R|·|S| / max(d_R, d_S)
    against the TRUE join size, for the two core fact joins
    (orders⋈customer on custkey, lineitem⋈orders on orderkey). All
    four inputs are single streaming aggregates (row counts + exact
    distinct-key counts via one (key) exchange each); the true size of
    a key-FK join is Σ_k cnt_R(k)·cnt_S(k), computed from the two
    per-key count tables with one more keyed exchange — never a
    materialized join. err_ppm = 10⁶·|est − true| // true."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions)

    def key_counts(path: str, col: str, alias: str):
        ds = _read_pq(path, columns=[col])

        def pre(t: pa.Table) -> pa.Table:
            out = pa.table({
                "k": pc.cast(t.column(col), pa.int64()),
                "c": pa.array(np.ones(len(t), np.int64), pa.int64())})
            return out.group_by(["k"]).aggregate(
                [("c", "sum")]).rename_columns(["k", "c"])

        return hash_agg(ds.map_batches(pre, batch_format="pyarrow"),
                        "k", [("c", "sum", alias)])

    rows = []
    for name, (pa_, ca_), (pb_, cb_) in (
            ("orders_customer",
             (f"{sf_dir}/orders.parquet", "o_custkey"),
             (f"{sf_dir}/customer.parquet", "c_custkey")),
            ("lineitem_orders",
             (f"{sf_dir}/lineitem.parquet", "l_orderkey"),
             (f"{sf_dir}/orders.parquet", "o_orderkey"))):
        left = key_counts(pa_, ca_, "cl")
        right = key_counts(pb_, cb_, "cr")

        # tagged union → one keyed exchange computes everything:
        # n/d per side and true = Σ cl·cr over shared keys
        lt = left.map_batches(
            lambda t: pa.table({"k": t.column("k"),
                                "cl": t.column("cl"),
                                "cr": pa.array(
                                    np.zeros(len(t), np.int64))}),
            batch_format="pyarrow")
        rt = right.map_batches(
            lambda t: pa.table({"k": t.column("k"),
                                "cl": pa.array(
                                    np.zeros(len(t), np.int64)),
                                "cr": t.column("cr")}),
            batch_format="pyarrow")

        def stats(t: pa.Table) -> pa.Table:
            k = t.column("k").to_numpy(zero_copy_only=False)
            if not len(k):
                z = pa.array([], pa.int64())
                return pa.table({c: z for c in
                                 ("nl", "nr", "dl", "dr", "tr")})
            cl = t.column("cl").to_numpy(zero_copy_only=False)
            cr = t.column("cr").to_numpy(zero_copy_only=False)
            from magic_content_extractor_ray.stages.window import (
                segment_lengths, segment_starts)

            starts = segment_starts(k)
            lens = segment_lengths(starts, len(k))
            # per distinct key: summed cl and cr (sides were
            # pre-aggregated, so a key has ≤1 row per side)
            scl = np.add.reduceat(cl, starts)
            scr = np.add.reduceat(cr, starts)
            return pa.table({
                "nl": pa.array([int(cl.sum())], pa.int64()),
                "nr": pa.array([int(cr.sum())], pa.int64()),
                "dl": pa.array([int((scl > 0).sum())], pa.int64()),
                "dr": pa.array([int((scr > 0).sum())], pa.int64()),
                "tr": pa.array([int((scl * scr).sum())], pa.int64())})

        parts = map_key_partitions(lt.union(rt), "k",
                                   stats).take_all()
        nl = sum(int(r["nl"]) for r in parts)
        nr = sum(int(r["nr"]) for r in parts)
        dl = sum(int(r["dl"]) for r in parts)
        dr = sum(int(r["dr"]) for r in parts)
        true = sum(int(r["tr"]) for r in parts)
        est = (nl * nr) // max(dl, dr)
        rows.append({
            "join": name, "n_left": nl, "n_right": nr,
            "d_left": dl, "d_right": dr, "est": est, "true_n": true,
            "err_ppm": (1_000_000 * abs(est - true)) // max(true, 1)})
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in ("n_left", "n_right", "d_left", "d_right",
                              "est", "true_n", "err_ppm")}).sort_values(
        "join").reset_index(drop=True)


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


def q_pps_systematic(sf_dir: str):
    """Probability-proportional-to-size SYSTEMATIC sampling (the
    survey-sampling complement of the A-ES weighted sample): docs in
    doc_id order with size = n_chars; doc i is selected iff the
    cumulative size crosses a new multiple of W/k (k = 50,
    deterministic zero offset, documented) — i.e.
    ⌊cum_i·k/W⌋ > ⌊cum_{i-1}·k/W⌋, all integer arithmetic. One
    two-phase prefix-sum scan; selection is a pure map over the ranked
    rows. Output (doc_id, n_chars, pick_idx)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum

    K = 50

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
            "w": pc.cast(t.column("n_chars"), pa.int64())})

    base = docs.map_batches(prep, batch_format="pyarrow")
    total = int(base.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(t.column("w").to_numpy(zero_copy_only=False).sum())],
            pa.int64())}),
        batch_format="pyarrow").to_pandas()["s"].sum())

    ranked = keyed_prefix_sum(base, key_column="doc_id",
                              value_column="w", out_column="cum0")

    def select(df: pd.DataFrame) -> pd.DataFrame:
        cum0 = df["cum0"].to_numpy(dtype="int64")       # exclusive
        w = df["w"].to_numpy(dtype="int64")
        cum1 = cum0 + w                                  # inclusive
        b0 = (cum0 * K) // total
        b1 = (cum1 * K) // total
        sel = b1 > b0
        out = pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64")[sel],
            "n_chars": pd.Series(w[sel], index=df.index[sel],
                                 dtype="int64"),
            "pick_idx": pd.Series(b0[sel], index=df.index[sel],
                                  dtype="int64")})
        return out

    return ranked.map_batches(select,
                              batch_format="pandas").sort("doc_id")


def q_hill_tail(sf_dir: str):
    """HILL ESTIMATOR of the doc-length tail index (the heavy-tail
    diagnostic behind giant-doc capacity planning): over the k = 100
    largest docs, H = (1/k)·Σ ln(x₍ᵢ₎/x₍ₖ₊₁₎) and α = 1/H. Each log
    term is rounded to integer nanos before the exact sum (nano-nat
    idiom); α is the integer quotient k·10¹⁵ // Σ. Top-(k+1) selection
    is per-partition select_k candidates + a driver final — only
    k+1 rows ever leave the cluster."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    K = 100

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])

    def topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=K + 1, sort_keys=[("n_chars", "descending"),
                                   ("doc_id", "ascending")])
        return t.take(idx)

    cand = docs.map_batches(topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True]).head(K + 1)
    v = cand["n_chars"].to_numpy().astype(np.int64)
    xr = int(v[K])
    terms = np.floor(np.log(v[:K].astype(np.float64) / float(xr))
                     * 1e9 + 0.5).astype(np.int64)
    sl = int(terms.sum())
    alpha = (K * 1_000_000_000 * 1_000_000) // sl if sl else 0
    return pd.DataFrame([{"k": K, "sum_log_nano": sl,
                          "alpha_micro": alpha}]).astype("int64")


def q_gini_split(sf_dir: str):
    """DECISION-STUMP split scan: for every candidate threshold v on
    doc length, the exact Gini-gain numerator/denominator of splitting
    lang at n_chars ≤ v — maximizing ΣcL²/n_L + ΣcR²/n_R, emitted as
    the integer pair (gain_num = ΣcL²·n_R + ΣcR²·n_L, gain_den =
    n_L·n_R) so there is NO float impurity or argmax anywhere (the
    tree induction layer can cross-multiply). One (value, lang)
    histogram combiner shuffle; the cumulative sweep then runs on the
    driver over the O(distinct values × langs) histogram — the same
    bounded-state class as the exact-grouped-quantile policy (never
    rows). Integer bound: c²·n must fit int64 — beyond ~10⁶ docs per
    class, lift the accumulator to Python ints as embedding_covariance
    does. Thresholds with an empty right side are excluded."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["lang", "n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        out = pa.table({
            "v": pc.cast(t.column("n_chars"), pa.int64()),
            "lang": t.column("lang"),
            "c": pa.array(np.ones(len(t), np.int64), pa.int64())})
        return out.group_by(["v", "lang"]).aggregate(
            [("c", "sum")]).rename_columns(["v", "lang", "c"])

    hist = hash_agg(docs.map_batches(pre, batch_format="pyarrow"),
                    "v", [("c", "sum", "c")],
                    group_cols=["v", "lang"]).to_pandas()

    piv = hist.pivot_table(index="v", columns="lang", values="c",
                           aggfunc="sum", fill_value=0).sort_index()
    vals = piv.index.to_numpy().astype(np.int64)
    m = piv.to_numpy().astype(np.int64)          # (values, langs)
    cl = np.cumsum(m, axis=0)                    # left counts at ≤ v
    tot = cl[-1]
    cr = tot[None, :] - cl
    n_l = cl.sum(axis=1)
    n_r = cr.sum(axis=1)
    keep = n_r > 0
    g_num = ((cl ** 2).sum(axis=1) * n_r
             + (cr ** 2).sum(axis=1) * n_l)
    return pd.DataFrame({
        "v": vals[keep],
        "n_left": n_l[keep],
        "gain_num": g_num[keep],
        "gain_den": (n_l * n_r)[keep]}).astype("int64").reset_index(
        drop=True)


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


def q_coverage_select(sf_dir: str):
    """GREEDY MAX-COVERAGE document selection (the classic (1−1/e) set
    cover greedy — the coverage-based data-selection recipe for
    instruction/eval set construction): pick 10 docs that together
    cover as much of the top-500 corpus vocabulary as possible. Each
    round broadcasts the uncovered-term bitmap (500 bools) and runs a
    distributed per-partition argmax of |terms(doc) ∩ uncovered|
    (ties doc_id asc; the winning partition row carries the doc's term
    ids so the driver can update the bitmap without a second pass).
    The (doc, term-id) pair table is built once — vocab-membership
    tokenize map, doc-keyed partitions materialized so each partition
    holds complete docs. Unrolled-CTE SQL twin, 10 rounds."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    V, K = 500, 10

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def term_df(t: pa.Table) -> pa.Table:
        texts = t.column("text")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts),
                                       pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        g = pa.table({"term": flat.filter(keep),
                      "row": parent.filter(keep)}).group_by(
            ["term", "row"]).aggregate([])
        return pa.table({
            "term": g.column("term"),
            "df": pa.array(np.ones(len(g), np.int64), pa.int64())})

    dfs = hash_agg(docs.map_batches(term_df, batch_format="pyarrow"),
                   "term", [("df", "sum", "df")])

    def topv(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=V, sort_keys=[("df", "descending"),
                               ("term", "ascending")])
        return t.take(idx)

    cand = dfs.map_batches(topv, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["df", "term"],
                            ascending=[False, True]).head(V)
    vocab = np.sort(cand["term"].to_numpy().astype(object))
    vref = ray.put(vocab)

    def doc_tids(t: pa.Table, _v=vref) -> pa.Table:
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
        hit = vv[pidx] == words
        ids = pc.cast(t.column("doc_id").take(parent.filter(
            pa.array(hit))), pa.int64()).to_numpy(zero_copy_only=False)
        tid = pidx[hit]
        pk = ids * np.int64(V) + tid
        u = np.unique(pk)
        return pa.table({
            "doc_id": pa.array(u // V, pa.int64()),
            "tid": pa.array(u % V, pa.int64())})

    pairs = map_key_partitions(
        docs.map_batches(doc_tids, batch_format="pyarrow"),
        "doc_id", lambda t: t).materialize()

    uncovered = np.ones(len(vocab), dtype=bool)
    out = {"round": [], "doc_id": [], "n_new": [], "n_total": []}
    chosen: set[int] = set()
    for rnd in range(1, K + 1):
        st = ray.put({"u": uncovered.copy(),
                      "excl": np.array(sorted(chosen), np.int64)})

        def best(t: pa.Table, _s=st) -> pa.Table:
            s = ray.get(_s)
            d = t.column("doc_id").to_numpy(zero_copy_only=False)
            empty = pa.table({"doc_id": pa.array([], pa.int64()),
                              "n": pa.array([], pa.int64()),
                              "tids": pa.array([],
                                               pa.list_(pa.int64()))})
            if not len(d):
                return empty
            tid = t.column("tid").to_numpy(zero_copy_only=False)
            unc = s["u"][tid].astype(np.int64)
            starts = segment_starts(d)
            lens = segment_lengths(starts, len(d))
            cnt = np.add.reduceat(unc, starts)
            dd = d[starts]
            ok = ~np.isin(dd, s["excl"])
            if not ok.any():
                return empty
            cnt2 = np.where(ok, cnt, -1)
            top = np.flatnonzero(cnt2 == cnt2.max())
            j = int(top[np.argmin(dd[top])])
            lo, ln = int(starts[j]), int(lens[j])
            new_t = tid[lo:lo + ln][s["u"][tid[lo:lo + ln]]]
            return pa.table({
                "doc_id": pa.array([int(dd[j])], pa.int64()),
                "n": pa.array([int(cnt[j])], pa.int64()),
                "tids": pa.array([new_t.tolist()],
                                 pa.list_(pa.int64()))})

        cands = pairs.map_batches(best,
                                  batch_format="pyarrow").take_all()
        if not cands:
            break
        nxt = max(cands, key=lambda r: (r["n"], -r["doc_id"]))
        if int(nxt["n"]) == 0:
            break
        chosen.add(int(nxt["doc_id"]))
        for tdd in nxt["tids"]:
            uncovered[int(tdd)] = False
        out["round"].append(rnd)
        out["doc_id"].append(int(nxt["doc_id"]))
        out["n_new"].append(int(nxt["n"]))
        out["n_total"].append(int((~uncovered).sum()))
    return pd.DataFrame(out).astype("int64")


def _coverage_oracle(k: int = 10, v: int = 500) -> str:
    """Unrolled greedy max-coverage twin of q_coverage_select (each
    round: join against the remaining-uncovered term set, argmax by
    (count desc, doc_id asc), EXCEPT out the pick's terms)."""
    parts = [
        "WITH toks AS MATERIALIZED (SELECT DISTINCT doc_id, "
        "unnest(list_filter(regexp_split_to_array(lower(text), "
        "'\\s+'), w -> w <> '')) AS term FROM documents), "
        "tdf AS (SELECT term, count(*) AS df FROM toks GROUP BY 1), "
        "voc AS MATERIALIZED (SELECT term FROM (SELECT term, "
        f"row_number() OVER (ORDER BY df DESC, term) AS rn FROM tdf) "
        f"WHERE rn <= {v}), "
        "dt AS MATERIALIZED (SELECT t.doc_id, t.term FROM toks t "
        "JOIN voc USING (term)), "
        "u0 AS MATERIALIZED (SELECT term FROM voc)"]
    for i in range(1, k + 1):
        excl = " AND ".join(
            [f"doc_id <> (SELECT doc_id FROM p{j})"
             for j in range(1, i)]) or "TRUE"
        parts.append(
            f", p{i} AS MATERIALIZED (SELECT doc_id, "
            f"CAST(count(*) AS BIGINT) AS n FROM dt "
            f"JOIN u{i-1} USING (term) WHERE {excl} GROUP BY 1 "
            f"ORDER BY n DESC, doc_id LIMIT 1)"
            f", u{i} AS MATERIALIZED (SELECT term FROM u{i-1} "
            f"EXCEPT SELECT term FROM dt "
            f"WHERE doc_id = (SELECT doc_id FROM p{i}))")
    sel = []
    for i in range(1, k + 1):
        sel.append(
            f"SELECT CAST({i} AS BIGINT) AS round, doc_id, n AS n_new, "
            f"(SELECT count(*) FROM voc) - (SELECT count(*) FROM u{i}) "
            f"AS n_total FROM p{i}")
    parts.append(" " + " UNION ALL ".join(sel) + " ORDER BY round")
    return "".join(parts)


def q_curation_pipeline(sf_dir: str):
    """END-TO-END CORPUS CURATION: quality gate (≥10 tokens) → exact
    dedup (min doc id per md5) → per-source token caps by water-filling
    half the surviving budget → greedy per-source truncation in doc_id
    order → curriculum position (length deciles, round-robin across
    sources). The four stages each reuse a proven exchange shape
    (content-hash exchange, source combiner + driver waterfill on the
    m-row aggregate, per-source cumsum exchange, prefix-sum deciles +
    packed-rank position scan) and the WHOLE composition is verified by
    one SQL twin — the training_pipeline complement where every stage
    is SQL-expressible. Output: (doc_id, source, n_tokens, position)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum
    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    MIN_TOKENS = 10

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "source", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        nt = pc.cast(pc.count_substring_regex(
            t.column("text"), pattern=r"\S+"), pa.int64())
        keep = pc.greater_equal(nt, MIN_TOKENS)
        t2 = t.filter(keep)
        texts = t2.column("text").to_pylist()
        hh = [hashlib.md5((x or "").encode("utf-8")).hexdigest()
              for x in texts]
        return pa.table({
            "h": pa.array(hh, pa.string()),
            "doc_id": pc.cast(t2.column("doc_id"), pa.int64()),
            "source": t2.column("source"),
            "nt": nt.filter(keep)})

    def dedup_min(t: pa.Table) -> pa.Table:
        h = t.column("h").to_numpy(zero_copy_only=False)
        if not len(h):
            return t.select(["doc_id", "source", "nt"])
        starts = segment_starts(h)   # sorted by (h, doc_id)
        return t.take(pa.array(starts)).select(
            ["doc_id", "source", "nt"])

    surv = map_key_partitions(
        docs.map_batches(keyed, batch_format="pyarrow"),
        "h", dedup_min, sort_cols=["doc_id"]).materialize()

    per_src = hash_agg(surv, "source",
                       [("nt", "sum", "n_tokens")]).to_pandas()
    per_src = per_src.sort_values("source").reset_index(drop=True)
    n = per_src["n_tokens"].to_numpy().astype(np.int64)
    srcs = per_src["source"].to_numpy()
    total, m = int(n.sum()), len(n)
    B = total // 2
    order = np.lexsort((srcs, n))
    ns_sorted = n[order]
    prefix = np.concatenate([[0], np.cumsum(ns_sorted)[:-1]])
    cands = set(int(x) for x in ns_sorted)
    for kk in range(m):
        cands.add(max(0, (B - int(prefix[kk])) // (m - kk)))
    tstar = max((T for T in cands
                 if int(np.minimum(n, T).sum()) <= B), default=0)
    base = np.minimum(n, tstar)
    L = B - int(base.sum())
    bonus = np.zeros(m, np.int64)
    above = n > tstar
    if L > 0 and above.any():
        pri = [i for i in np.lexsort((srcs, -n)) if above[i]][:L]
        bonus[pri] = 1
    alloc = {s: int(a) for s, a in zip(srcs, base + bonus)}
    aref = ray.put(alloc)

    def cap(t: pa.Table, _a=aref) -> pa.Table:
        al = ray.get(_a)
        s = t.column("source").to_numpy(zero_copy_only=False)
        if not len(s):
            return t
        nt = t.column("nt").to_numpy(zero_copy_only=False)
        starts = segment_starts(s)
        lens = segment_lengths(starts, len(s))
        cum = np.cumsum(nt)
        cum0 = cum - nt - np.repeat((cum - nt)[starts], lens)
        lim = np.array([al.get(x, 0) for x in s[starts]], np.int64)
        keep = cum0 + nt <= np.repeat(lim, lens)
        return t.filter(pa.array(keep))

    capped = map_key_partitions(surv, "source", cap,
                                sort_cols=["doc_id"]).materialize()

    # curriculum position over the capped survivors (the
    # q_curriculum_order shape on (doc_id, source, nt))
    n_total = capped.count()
    q10, r10 = divmod(n_total, 10)

    src_list = sorted(alloc)
    sidx = {s: i for i, s in enumerate(src_list)}
    mm = len(src_list)

    ranked = keyed_prefix_sum(
        capped.map_batches(
            lambda t: pa.table({
                "v": t.column("nt"),
                "doc_id": t.column("doc_id"),
                "source": t.column("source"),
                "one": pa.array(np.ones(len(t), np.int64))}),
            batch_format="pyarrow"),
        key_column="v", value_column="one", tie_column="doc_id",
        out_column="rk", bucket_width=64)

    def decile_key(df: pd.DataFrame) -> pd.DataFrame:
        rank = df["rk"].to_numpy(dtype="int64") + 1
        cut = r10 * (q10 + 1)
        first = rank <= cut
        dec = np.where(first, 1 + (rank - 1) // max(q10 + 1, 1),
                       1 + r10 + (rank - cut - 1) // max(q10, 1)) \
            .astype(np.int64)
        si = df["source"].map(sidx).to_numpy(dtype="int64")
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype("int64"),
            "source": df["source"],
            "v": df["v"].astype("int64"),
            "ds": dec * mm + si, "decile": dec})

    keyed2 = ranked.map_batches(decile_key, batch_format="pandas")

    def within_rank(t: pa.Table) -> pa.Table:
        ds_ = t.column("ds").to_numpy(zero_copy_only=False)
        if not len(ds_):
            z = pa.array([], pa.int64())
            return pa.table({"doc_id": z,
                             "source": pa.array([], pa.string()),
                             "v": z, "pk": z, "one": z})
        dec = t.column("decile").to_numpy(zero_copy_only=False)
        starts = segment_starts(ds_)
        lens = segment_lengths(starts, len(ds_))
        rr = np.arange(len(ds_), dtype=np.int64) - \
            np.repeat(starts, lens)
        si = ds_ - dec * mm
        pk = (dec << np.int64(46)) | (rr << np.int64(6)) | si
        return pa.table({
            "doc_id": t.column("doc_id"),
            "source": t.column("source"),
            "v": t.column("v"),
            "pk": pa.array(pk, pa.int64()),
            "one": pa.array(np.ones(len(ds_), np.int64), pa.int64())})

    wr = map_key_partitions(keyed2, "ds", within_rank,
                            sort_cols=["v", "doc_id"])
    pos = keyed_prefix_sum(wr, key_column="pk", value_column="one",
                           out_column="position",
                           bucket_width=1 << 46)
    return pos.map_batches(
        lambda df: df[["doc_id", "source", "v", "position"]].rename(
            columns={"v": "n_tokens"}),
        batch_format="pandas").sort("doc_id")


def q_join_order_costs(sf_dir: str):
    """Selinger-style JOIN-ORDER cost enumeration for the 3-table
    chain customer ⋈ orders ⋈ lineitem (query-optimizer family,
    composing q_join_cardinality_model's statistics): every left-deep
    order without cross products, costed as Σ estimated intermediate
    sizes under the textbook uniform model — |R⋈S| = nR·nS/max(dR,dS),
    with the surviving distinct-key count of an intermediate modeled
    as least(d_base, n_intermediate) (documented; both engines
    implement the identical model, all integer arithmetic). The five
    table statistics are streaming aggregates; the 4-order enumeration
    is driver-side."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    def stats(path, cols):
        """n rows + exact distinct per key column — each distinct via
        one keyed combiner exchange (never a driver-side key union)."""
        ds = _read_pq(path, columns=cols)
        n = ds.count()
        d = {}
        for c in cols:
            def pre(t: pa.Table, _c=c) -> pa.Table:
                u = np.unique(t.column(_c).to_numpy(
                    zero_copy_only=False).astype(np.int64))
                return pa.table({"k": pa.array(u, pa.int64()),
                                 "one": pa.array(
                                     np.ones(len(u), np.int64),
                                     pa.int64())})

            d[c] = hash_agg(ds.map_batches(pre, batch_format="pyarrow"),
                            "k", [("one", "max", "one")]).count()
        return n, d

    nC, dC = stats(f"{sf_dir}/customer.parquet", ["c_custkey"])
    nO, dO = stats(f"{sf_dir}/orders.parquet",
                   ["o_custkey", "o_orderkey"])
    nL, dL = stats(f"{sf_dir}/lineitem.parquet", ["l_orderkey"])

    cust_c, cust_o = dC["c_custkey"], dO["o_custkey"]
    ord_o, ord_l = dO["o_orderkey"], dL["l_orderkey"]

    def est(nr, ns, dr, ds_):
        return (nr * ns) // max(dr, ds_)

    rows = []
    # C,O then L / O,C then L
    n1 = est(nC, nO, cust_c, cust_o)
    n2 = est(n1, nL, min(ord_o, n1), ord_l)
    for o in ("C,O,L", "O,C,L"):
        rows.append({"join_order": o, "cost": n1 + n2})
    # L,O then C / O,L then C
    n1b = est(nL, nO, ord_l, ord_o)
    n2b = est(n1b, nC, min(cust_o, n1b), cust_c)
    for o in ("L,O,C", "O,L,C"):
        rows.append({"join_order": o, "cost": n1b + n2b})
    best = min(rows, key=lambda r: (r["cost"], r["join_order"]))
    for r in rows:
        r["is_best"] = int(r["join_order"] == best["join_order"])
    return pd.DataFrame(rows).astype(
        {"cost": "int64", "is_best": "int64"}).sort_values(
        "join_order").reset_index(drop=True)


def q_shapley_coverage(sf_dir: str):
    """EXACT SHAPLEY VALUES of the five languages in the vocabulary-
    coverage game (the data-valuation question "which slice contributes
    the most unique coverage?"): v(S) = number of distinct terms that
    appear in at least one language of S. The distributed part reduces
    every term to a 5-bit language bitmask (one term-keyed exchange;
    segment-wise OR), leaving a 31-cell mask histogram — the whole
    game — on the driver, where Shapley is computed EXACTLY over all
    2⁵ coalitions with integer factorial weights (φ scaled by 5! = 120,
    no floats). Efficiency (Σφ = 120·v(N)) is asserted in pytest.
    Output: (lang, phi_num, phi_den=120, v_solo, v_all)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        map_key_partitions, segment_lengths, segment_starts)

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["lang", "text"])
    lang_rows = docs.groupby("lang").count().take_all()
    langs = sorted(r["lang"] for r in lang_rows)
    n = len(langs)
    lidx = {s: i for i, s in enumerate(langs)}

    def term_lang(t: pa.Table) -> pa.Table:
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
        lg = t.column("lang").take(parent).to_numpy(
            zero_copy_only=False)
        bits = np.array([1 << lidx[x] for x in lg], dtype=np.int64)
        tt = pa.table({"term": flat, "b": pa.array(bits, pa.int64())})
        # map-side OR-combine per term (numpy: arrow has no bit_or agg)
        terms = tt.column("term").to_numpy(zero_copy_only=False)
        order = np.argsort(terms, kind="stable")
        terms, bb = terms[order], bits[order]
        starts = segment_starts(terms)
        lens = segment_lengths(starts, len(terms))
        om = np.zeros(len(starts), np.int64)
        for k in range(n):
            has = np.add.reduceat((bb >> k) & 1, starts) > 0
            om |= has.astype(np.int64) << k
        return pa.table({"term": pa.array(terms[starts]),
                         "b": pa.array(om, pa.int64())})

    def mask_of(t: pa.Table) -> pa.Table:
        terms = t.column("term").to_numpy(zero_copy_only=False)
        if not len(terms):
            return pa.table({"mask": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        b = t.column("b").to_numpy(zero_copy_only=False)
        starts = segment_starts(terms)
        lens = segment_lengths(starts, len(terms))
        om = np.zeros(len(starts), np.int64)
        for k in range(n):
            has = np.add.reduceat((b >> k) & 1, starts) > 0
            om |= has.astype(np.int64) << k
        u, cnt = np.unique(om, return_counts=True)
        return pa.table({"mask": pa.array(u, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    cells = map_key_partitions(
        docs.map_batches(term_lang, batch_format="pyarrow"),
        "term", mask_of).take_all()
    cnt = np.zeros(1 << n, np.int64)
    for r in cells:
        cnt[int(r["mask"])] += int(r["c"])

    masks = np.arange(1 << n)

    def v(S: int) -> int:
        return int(cnt[(masks & S) != 0].sum())

    import math

    fact = [math.factorial(k) for k in range(n + 1)]
    rows = []
    v_all = v((1 << n) - 1)
    for i, lg in enumerate(langs):
        phi = 0
        for S in range(1 << n):
            if S & (1 << i):
                continue
            s = bin(S).count("1")
            phi += fact[s] * fact[n - 1 - s] * (v(S | (1 << i)) - v(S))
        rows.append({"lang": lg, "phi_num": phi, "phi_den": fact[n],
                     "v_solo": v(1 << i), "v_all": v_all})
    return pd.DataFrame(rows).astype(
        {c: "int64" for c in ("phi_num", "phi_den", "v_solo",
                              "v_all")}).sort_values("lang").reset_index(
        drop=True)


def q_modularity(sf_dir: str):
    """NEWMAN MODULARITY of the connected-component partition of the
    co-view graph, exact: Q = Σ_c (e_c/m − (deg_c/2m)²) emitted as the
    integer pair q_num = Σ_c (4m·e_c − deg_c²), q_den = 4m² (no float
    division; for the CC partition every edge is intra-community, so
    Q measures how far the component structure beats the configuration
    model). Components come from stages/graph.connected_components;
    per-component edge/degree sums are one keyed combiner after a
    label hash_join onto the edge list."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from magic_content_extractor_ray.stages.graph import (
        connected_components)
    from magic_content_extractor_ray.stages.join import hash_join
    from magic_content_extractor_ray.stages.window import hash_agg

    def unpack(t: pa.Table) -> pa.Table:
        pk = t.column("pk").to_numpy(zero_copy_only=False)
        return pa.table({
            "a": pa.array(pk >> np.int64(31), pa.int64()),
            "b": pa.array(pk & np.int64((1 << 31) - 1), pa.int64())})

    edges = _covis_pair_counts(sf_dir).filter(
        lambda r: r["n_users"] >= 2).map_batches(
        unpack, batch_format="pyarrow").materialize()

    comp = connected_components(edges, left="a", right="b",
                                node_col="node",
                                label_col="component")
    # comp: (node, component) — label both endpoints
    e1 = hash_join(edges, comp.map_batches(
        lambda t: pa.table({"a": t.column("node"),
                            "ca": t.column("component")}),
        batch_format="pyarrow"), key="a", left_cols=["b"],
        right_cols=["ca"], how="inner",
        left_types={"a": pa.int64(), "b": pa.int64()},
        right_types={"a": pa.int64(), "ca": pa.int64()})

    def epart(t: pa.Table) -> pa.Table:
        c = t.column("ca").to_numpy(zero_copy_only=False)
        u, k = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(u, pa.int64()),
                         "ec": pa.array(k.astype(np.int64),
                                        pa.int64())})

    ec = hash_agg(e1.map_batches(epart, batch_format="pyarrow"),
                  "c", [("ec", "sum", "ec")]).to_pandas()

    def sym(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        return pa.table({"node": pa.array(np.concatenate([a, b]),
                                          pa.int64())})

    degs = hash_join(
        edges.map_batches(sym, batch_format="pyarrow").map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "d": pa.array(np.ones(len(t), np.int64), pa.int64())}),
            batch_format="pyarrow"),
        comp, key="node", left_cols=["d"], right_cols=["component"],
        how="inner",
        left_types={"node": pa.int64(), "d": pa.int64()},
        right_types={"node": pa.int64(), "component": pa.int64()})

    def dpart(t: pa.Table) -> pa.Table:
        c = t.column("component").to_numpy(zero_copy_only=False)
        d = t.column("d").to_numpy(zero_copy_only=False)
        u, inv = np.unique(c, return_inverse=True)
        return pa.table({"c": pa.array(u, pa.int64()),
                         "dc": pa.array(np.bincount(
                             inv, weights=d, minlength=len(u))
                             .astype(np.int64), pa.int64())})

    dc = hash_agg(degs.map_batches(dpart, batch_format="pyarrow"),
                  "c", [("dc", "sum", "dc")]).to_pandas()

    m = int(ec["ec"].sum())
    merged = ec.set_index("c").join(dc.set_index("c"), how="outer") \
        .fillna(0).astype("int64")
    q_num = int((4 * m * merged["ec"] - merged["dc"] ** 2).sum())
    return pd.DataFrame([{
        "n_edges": m, "n_components": len(merged),
        "q_num": q_num, "q_den": 4 * m * m}]).astype("int64")


def q_runs_test(sf_dir: str):
    """WALD–WOLFOWITZ RUNS TEST for randomness of the daily revenue
    series (the regime-shift screen before trend fitting): days are
    marked above/below the series' lower median (ties → below,
    documented), R = number of runs, z = (R − μ)/σ with the exact
    textbook moments — integer (R, n1, n2) from the data, one float
    composition mirrored verbatim in the SQL twin, rounded to nanos.
    The corpus-scale part is the per-day revenue combiner; the series
    itself is time-dimension-scale (the revenue_autocorr policy)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("o_orderdate"), pa.int64()),
                        86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100)), pa.int64())
        out = pa.table({"day": day, "rev": cents})
        return out.group_by(["day"]).aggregate(
            [("rev", "sum")]).rename_columns(["day", "rev"])

    series = hash_agg(orders.map_batches(pre, batch_format="pyarrow"),
                      "day", [("rev", "sum", "rev")]).to_pandas()
    series = series.sort_values("day").reset_index(drop=True)
    rev = series["rev"].to_numpy().astype(np.int64)
    day = series["day"].to_numpy().astype(np.int64)
    n = len(rev)
    order = np.lexsort((day, rev))
    med = int(rev[order[(n - 1) // 2]])
    sign = rev > med
    n1 = int(sign.sum())
    n2 = n - n1
    runs = 1 + int((sign[1:] != sign[:-1]).sum()) if n else 0
    if n1 == 0 or n2 == 0 or n < 2:
        z_nano = 0
    else:
        num = runs - (2.0 * n1 * n2 / n + 1.0)
        den = math.sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n))
                        / (n * n * (n - 1.0)))
        z_nano = int(math.floor(num / den * 1e9 + 0.5))
    return pd.DataFrame([{
        "n_days": n, "n_above": n1, "n_below": n2,
        "n_runs": runs, "z_nano": z_nano}]).astype("int64")


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


def q_lead_lag(sf_dir: str):
    """LEAD–LAG cross-covariance scan between the daily view and
    purchase count series (does engagement LEAD conversion, and by how
    many days?): for every lag 0..7, the exact integer covariance
    numerator n·Σxy − Σx·Σy of (views_t, purchases_{t+lag}) over the
    overlapping days — emitted for ALL lags as integers (num, n_pairs)
    so the argmax is the consumer's exact integer comparison, never a
    float. One per-day combiner; the 8-lag sweep runs on the
    time-dimension-scale series."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["ts", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("ts"), pa.int64()),
                        86_400_000_000)
        isv = pc.cast(pc.equal(t.column("event_type"), "view"),
                      pa.int64())
        isp = pc.cast(pc.equal(t.column("event_type"), "purchase"),
                      pa.int64())
        out = pa.table({"day": day, "v": isv, "p": isp})
        return out.group_by(["day"]).aggregate(
            [("v", "sum"), ("p", "sum")]).rename_columns(
            ["day", "v", "p"])

    series = hash_agg(ev.map_batches(pre, batch_format="pyarrow"),
                      "day", [("v", "sum", "v"), ("p", "sum", "p")]
                      ).to_pandas().sort_values("day").reset_index(
        drop=True)
    day = series["day"].to_numpy().astype(np.int64)
    v = series["v"].to_numpy().astype(np.int64)
    p = series["p"].to_numpy().astype(np.int64)
    # dense day grid (missing days = 0 counts), mirrors the SQL grid
    lo, hi = int(day.min()), int(day.max())
    grid = np.zeros((hi - lo + 1, 2), np.int64)
    grid[day - lo, 0] = v
    grid[day - lo, 1] = p
    rows = []
    for lag in range(8):
        x = grid[:len(grid) - lag, 0]
        y = grid[lag:, 1]
        n = len(x)
        num = n * int(x @ y) - int(x.sum()) * int(y.sum())
        rows.append({"lag": lag, "n_pairs": n, "cov_num": num})
    return pd.DataFrame(rows).astype("int64")


def q_video_framesample(sf_dir: str):
    """VIDEO frame-sampling plumbing, end-to-end through the driver
    surface (the video twin of audio_metadata): one deterministic video
    ref per doc → fetch_media_stub synthesizes the payload + md5-seeded
    duration → stages/multimodal.VideoFrameSampler (actor pool,
    fake frames behind the decoder injection seam — no offline video
    codec exists) samples every 5th frame of the 25 fps stream. The
    SAMPLING SCHEDULE columns (n_frames, n_sampled, first/last index)
    are pure arithmetic on the md5-derived duration, re-derived
    independently by the SQL twin; frame-content features stay in the
    pytest that injects a real decoder callable."""
    import pyarrow as pa

    from magic_content_extractor_ray.stages.multimodal import (
        VideoFrameSampler, fetch_media_stub)

    docs = _read_pq(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_refs(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_ref": pa.array(
                [f"https://media.example/{i}/clip-0.mp4"
                 for i in ids], pa.string()),
            "kind": pa.array(["video"] * len(ids), pa.string())})

    def fetch(batch: pa.Table) -> pa.Table:
        media = fetch_media_stub(batch)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "media_ref": media.column("media_ref"),
                         "payload": media.column("payload"),
                         "duration_ms": media.column("duration_ms")})

    sampled = docs.map_batches(to_refs, batch_format="pyarrow") \
        .map_batches(fetch, batch_format="pyarrow") \
        .map_batches(VideoFrameSampler, batch_format="pyarrow",
                     fn_constructor_kwargs={"fake": True},
                     batch_size=256, concurrency=(1, 8))
    return sampled.map_batches(
        lambda t: t.select(["doc_id", "media_ref", "duration_ms",
                            "n_frames", "n_sampled", "first_idx",
                            "last_idx"]),
        batch_format="pyarrow").sort("doc_id")


def q_jonckheere(sf_dir: str):
    """JONCKHEERE–TERPSTRA ordered-alternative trend test: does doc
    length trend upward across sources taken in name order? J* = Σ over
    ordered source pairs (i < j) of [#(x < y) pairs + ½·#ties],
    reported doubled (j2 = 2·#less + #ties) so everything stays exact
    integers; the null moments are the closed forms μ = (N² − Σnᵢ²)/4
    and σ² = (N²(2N+3) − Σnᵢ²(2nᵢ+3))/72 (no-ties form, documented) —
    z in nanos from one mirrored float composition. All pair counts
    come from the per-(source, value) HISTOGRAM (the length_emd
    machinery: O(distinct values) per pair, never row pairs)."""
    import math

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["source", "n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        out = pa.table({
            "source": t.column("source"),
            "v": pc.cast(t.column("n_chars"), pa.int64()),
            "c": pa.array(np.ones(len(t), np.int64), pa.int64())})
        return out.group_by(["source", "v"]).aggregate(
            [("c", "sum")]).rename_columns(["source", "v", "c"])

    hist = hash_agg(docs.map_batches(pre, batch_format="pyarrow"),
                    "source", [("c", "sum", "c")],
                    group_cols=["source", "v"]).to_pandas()

    srcs = sorted(hist["source"].unique())
    by_src = {}
    for s in srcs:
        g = hist[hist.source == s].sort_values("v")
        by_src[s] = (g["v"].to_numpy().astype(np.int64),
                     g["c"].to_numpy().astype(np.int64))
    j2 = 0
    for a in range(len(srcs)):
        va, ca = by_src[srcs[a]]
        for b in range(a + 1, len(srcs)):
            vb, cb = by_src[srcs[b]]
            # #(x < y): for each y value, count of a-values below it
            cum_a = np.cumsum(ca)
            below = np.searchsorted(va, vb, side="left")
            less = int((np.where(below > 0, cum_a[below - 1], 0)
                        * cb).sum())
            eq_idx = np.searchsorted(va, vb, side="left")
            eq_mask = (eq_idx < len(va)) & (va[np.minimum(
                eq_idx, len(va) - 1)] == vb)
            ties = int((np.where(eq_mask, ca[np.minimum(
                eq_idx, len(va) - 1)], 0) * cb).sum())
            j2 += 2 * less + ties
    n_i = np.array([int(c.sum()) for _, c in by_src.values()],
                   dtype=np.int64)
    n = int(n_i.sum())
    sum_sq = int((n_i * n_i).sum())
    sum_cu = int((n_i * n_i * (2 * n_i + 3)).sum())
    mu2 = (n * n - sum_sq) // 2          # 2·μ (exact: N²−Σn² is even)
    var = (n * n * (2 * n + 3) - sum_cu) / 72.0
    z = ((j2 - mu2) / 2.0) / math.sqrt(var)
    z_nano = int(math.floor(z * 1e9 + 0.5))
    return pd.DataFrame([{
        "n": n, "k_groups": len(srcs), "j2": j2, "mu2": mu2,
        "z_nano": z_nano}]).astype("int64")


def q_james_stein(sf_dir: str):
    """JAMES–STEIN (positive-part) shrinkage of per-source mean doc
    lengths toward the grand mean — the empirical-Bayes stabilizer for
    small-sample per-slice statistics — formulated ENTIRELY on the
    micro-integer grid so both engines agree bit-for-bit: per-source
    means floor to micro units, the between-source spread S², the mean
    squared standard error v̄, and the positive-part factor
    F = max(0, S² − (k−3)·v̄) are exact integers, and the shrunk mean
    is m̄ + trunc(F·(mᵢ−m̄)/S²) (TRUNCATING division — DuckDB's //
    truncates toward zero on negatives, unlike Python's floor; the
    Python side mirrors truncation). One combiner exchange carries the
    (n, Σx, Σx²) sufficient stats; everything after is k-row driver
    arithmetic."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    M = 1_000_000

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["source", "n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column("n_chars"), pa.int64())
        out = pa.table({"source": t.column("source"), "s": v,
                        "q": pc.multiply(v, v),
                        "n": pa.array(np.ones(len(t), np.int64),
                                      pa.int64())})
        return out.group_by(["source"]).aggregate(
            [("s", "sum"), ("q", "sum"), ("n", "sum")]).rename_columns(
            ["source", "s", "q", "n"])

    st = hash_agg(docs.map_batches(pre, batch_format="pyarrow"),
                  "source", [("s", "sum", "s"), ("q", "sum", "q"),
                             ("n", "sum", "n")]).to_pandas()
    st = st.sort_values("source").reset_index(drop=True)
    k = len(st)
    srcs = st["source"].tolist()
    nn = [int(x) for x in st["n"]]
    ss = [int(x) for x in st["s"]]
    qq = [int(x) for x in st["q"]]

    mi = [(M * s) // n for s, n in zip(ss, nn)]
    mbar = sum(mi) // k
    dev = [m - mbar for m in mi]
    s2 = sum(d * d for d in dev)
    vmi = [(M * M * (n * q - s * s)) // (n * n * n)
           for n, s, q in zip(nn, ss, qq)]
    vbar = sum(vmi) // k
    f = max(0, s2 - (k - 3) * vbar)

    def tdiv(a: int, b: int) -> int:      # truncating division
        return -((-a) // b) if a < 0 else a // b

    shrunk = [mbar + tdiv(f * d, s2) if s2 else mbar for d in dev]
    return pd.DataFrame({
        "source": srcs,
        "n": pd.Series(nn, dtype="int64"),
        "mean_micro": pd.Series(mi, dtype="int64"),
        "shrunk_micro": pd.Series(shrunk, dtype="int64")})


def q_lttb_downsample(sf_dir: str):
    """LARGEST-TRIANGLE-THREE-BUCKETS downsampling of the daily revenue
    series (Steinarsson 2013 — the visualization downsampler): first
    and last points kept, the interior split into 20 integer-bound
    buckets, and each bucket contributes the point maximizing the
    triangle area against the PREVIOUS pick and the NEXT bucket's
    average — the sequential dependency that makes this a DP-flavored
    op. Areas are compared as EXACT integers (the next-bucket average
    rides as (Σx, Σy, den) and the 2·den-scaled cross product never
    divides; ties → earlier day). The corpus-scale part is the per-day
    revenue combiner; the 22-point sweep runs on the time-dimension
    series (the runs_test policy). SQL twin: one pick per recursive-CTE
    iteration."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    B = 20

    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("o_orderdate"), pa.int64()),
                        86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100)), pa.int64())
        out = pa.table({"day": day, "rev": cents})
        return out.group_by(["day"]).aggregate(
            [("rev", "sum")]).rename_columns(["day", "rev"])

    series = hash_agg(orders.map_batches(pre, batch_format="pyarrow"),
                      "day", [("rev", "sum", "rev")]).to_pandas()
    series = series.sort_values("day").reset_index(drop=True)
    x = series["day"].to_numpy().astype(np.int64)
    y = series["rev"].to_numpy().astype(np.int64)
    m = len(x)

    picks = [(int(x[0]), int(y[0]))]
    if m > 2:
        for b in range(B):
            lo = 1 + b * (m - 2) // B
            hi = 1 + (b + 1) * (m - 2) // B
            if lo >= hi:
                break
            if b < B - 1:
                nlo = 1 + (b + 1) * (m - 2) // B
                nhi = 1 + (b + 2) * (m - 2) // B
                sxn = int(x[nlo:nhi].sum())
                syn = int(y[nlo:nhi].sum())
                den = nhi - nlo
                if den == 0:
                    sxn, syn, den = int(x[m - 1]), int(y[m - 1]), 1
            else:
                sxn, syn, den = int(x[m - 1]), int(y[m - 1]), 1
            pd_, pr_ = picks[-1]
            best = None
            for i in range(lo, hi):
                a = abs((pd_ * den - sxn) * (int(y[i]) - pr_)
                        - (pd_ - int(x[i])) * (syn - pr_ * den))
                key = (-a, int(x[i]))
                if best is None or key < best[0]:
                    best = (key, (int(x[i]), int(y[i])))
            picks.append(best[1])
    if m > 1:
        picks.append((int(x[m - 1]), int(y[m - 1])))
    return pd.DataFrame({
        "ord": pd.Series(range(len(picks)), dtype="int64"),
        "day": pd.Series([p[0] for p in picks], dtype="int64"),
        "rev": pd.Series([p[1] for p in picks], dtype="int64")})


def q_sprt_crossing(sf_dir: str):
    """WALD SPRT over the event stream (the sequential A/B stopping
    rule): H₀ purchase-rate 0.2 vs H₁ 0.25, α = β = 0.05. Per-event
    log-likelihood-ratio increments are HARDCODED nano integers
    (+223143551 per purchase, −64538521 otherwise — precomputed once so
    no runtime libm call can disagree), the running LLR is the
    two-phase prefix-sum scan in (ts, event_id) order, and the verdict
    is the FIRST row where the cumulative LLR exits
    (−2944438979, +2944438979) = ±ln 19 — found distributed (per-batch
    earliest-crossing candidates, driver final min). Output one row:
    (decision, crossing_rank, cum_llr_nano) with decision 1 = accept
    H₁, −1 = accept H₀, 0 = never crossed (rank −1)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.scan import keyed_prefix_sum

    A, B_, UP = 223143551, -64538521, 2944438979

    ev = _read_pq(f"{sf_dir}/events.parquet",
                  columns=["ts", "event_id", "event_type"])

    def pre(t: pa.Table) -> pa.Table:
        isp = pc.equal(t.column("event_type"), "purchase")
        llr = pc.if_else(isp, pa.scalar(A, pa.int64()),
                         pa.scalar(B_, pa.int64()))
        return pa.table({
            "tsu": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "llr": llr,
            "one": pa.array(np.ones(len(t), np.int64))})

    base = ev.map_batches(pre, batch_format="pyarrow")
    cum = keyed_prefix_sum(base, key_column="tsu", value_column="llr",
                           tie_column="event_id", out_column="c0",
                           bucket_width=86_400_000_000)
    ranked = keyed_prefix_sum(
        cum.map_batches(lambda df: df, batch_format="pandas"),
        key_column="tsu", value_column="one", tie_column="event_id",
        out_column="r0", bucket_width=86_400_000_000)

    def crossers(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c0"].to_numpy(dtype="int64") + df["llr"].to_numpy(
            dtype="int64")                      # inclusive cum
        r = df["r0"].to_numpy(dtype="int64")
        hit = (c >= UP) | (c <= -UP)
        if not hit.any():
            return pd.DataFrame({"r": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        j = int(r[hit].argmin())
        rr = r[hit][j]
        cc = c[hit][j]
        return pd.DataFrame({"r": pd.Series([rr], dtype="int64"),
                             "c": pd.Series([cc], dtype="int64")})

    cands = ranked.map_batches(crossers,
                               batch_format="pandas").to_pandas()
    if len(cands):
        row = cands.sort_values("r").iloc[0]
        rank, c = int(row["r"]), int(row["c"])
        decision = 1 if c >= UP else -1
    else:
        rank, c, decision = -1, 0, 0
    return pd.DataFrame([{
        "decision": decision, "crossing_rank": rank,
        "cum_llr_nano": c}]).astype("int64")


def q_lis_revenue(sf_dir: str):
    """LONGEST STRICTLY-INCREASING SUBSEQUENCE of the daily revenue
    series (the monotone-regime probe; patience-sorting DP): output the
    LIS length plus, for determinism, the lexicographically smallest
    day sequence's END day — computed as the exact DP L[i] = 1 +
    max L[j] over j < i with rev[j] < rev[i] (O(m²) on the
    time-dimension series after the per-day combiner, the runs_test
    policy; SQL twin does the identical DP via a recursive CTE over
    rounds). Deterministic pick: among LIS-length ends, the earliest
    day."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    orders = _read_pq(f"{sf_dir}/orders.parquet",
                      columns=["o_orderdate", "o_totalprice"])

    def pre(t: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(t.column("o_orderdate"), pa.int64()),
                        86_400_000_000)
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), 100)), pa.int64())
        out = pa.table({"day": day, "rev": cents})
        return out.group_by(["day"]).aggregate(
            [("rev", "sum")]).rename_columns(["day", "rev"])

    series = hash_agg(orders.map_batches(pre, batch_format="pyarrow"),
                      "day", [("rev", "sum", "rev")]).to_pandas()
    series = series.sort_values("day").reset_index(drop=True)
    rev = series["rev"].to_numpy().astype(np.int64)
    day = series["day"].to_numpy().astype(np.int64)
    m = len(rev)
    L = np.ones(m, np.int64)
    for i in range(m):
        better = rev[:i] < rev[i]
        if better.any():
            L[i] = 1 + int(L[:i][better].max())
    if m:
        best = int(L.max())
        end_day = int(day[np.flatnonzero(L == best)[0]])
    else:
        best, end_day = 0, -1
    return pd.DataFrame([{
        "n_days": m, "lis_len": best, "end_day": end_day}]).astype(
        "int64")


def q_voptimal_histogram(sf_dir: str):
    """V-OPTIMAL HISTOGRAM construction (Jagadish et al. 1998 — the
    planner's minimum-variance bucket boundaries): doc lengths pre-bin
    into 64 equi-width cells with PURE integer arithmetic
    ((v−mn)·64 // (mx−mn+1) — no float bin edges), each cell carries
    exact (count, Σx, Σx²) from one combiner pass, and the 8-bucket
    partition minimizing total SSE is the classic DP over the 64-cell
    prefix sums — run on per-segment costs FLOORED to micro units
    (cost = (N·ΣQ − S²)·10⁶ // N, so the DP and its unrolled SQL twin
    compare identical integers; argmin ties → smaller split index).
    Output: 8 rows (seg, start_cell, end_cell, cost_micro)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import hash_agg

    CELLS, K = 64, 8

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["n_chars"])

    def minmax(t: pa.Table) -> pa.Table:
        v = t.column("n_chars")
        return pa.table({"mn": pa.array([pc.min(v).as_py()], pa.int64()),
                         "mx": pa.array([pc.max(v).as_py()],
                                        pa.int64())})

    mm = docs.map_batches(minmax, batch_format="pyarrow").to_pandas()
    mn, mx = int(mm["mn"].min()), int(mm["mx"].max())
    span = mx - mn + 1

    def cells(t: pa.Table) -> pa.Table:
        v = t.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        b = (v - mn) * CELLS // span
        out = pa.table({"cell": pa.array(b, pa.int64()),
                        "c": pa.array(np.ones(len(v), np.int64),
                                      pa.int64()),
                        "s": pa.array(v, pa.int64()),
                        "q": pa.array(v * v, pa.int64())})
        return out.group_by(["cell"]).aggregate(
            [("c", "sum"), ("s", "sum"), ("q", "sum")]).rename_columns(
            ["cell", "c", "s", "q"])

    agg = hash_agg(docs.map_batches(cells, batch_format="pyarrow"),
                   "cell", [("c", "sum", "c"), ("s", "sum", "s"),
                            ("q", "sum", "q")]).to_pandas()
    cn = np.zeros(CELLS, dtype=object)
    sn = np.zeros(CELLS, dtype=object)
    qn = np.zeros(CELLS, dtype=object)
    for r in agg.itertuples(index=False):
        cn[int(r.cell)] = int(r.c)
        sn[int(r.cell)] = int(r.s)
        qn[int(r.cell)] = int(r.q)
    pc_ = np.concatenate([[0], np.cumsum(cn)])
    ps = np.concatenate([[0], np.cumsum(sn)])
    pq_ = np.concatenate([[0], np.cumsum(qn)])

    def cost(i: int, j: int) -> int:      # cells i..j inclusive, micro
        n = int(pc_[j + 1] - pc_[i])
        if n == 0:
            return 0
        s = int(ps[j + 1] - ps[i])
        q = int(pq_[j + 1] - pq_[i])
        return ((n * q - s * s) * 1_000_000) // n

    INF = 1 << 126
    d = [[INF] * CELLS for _ in range(K + 1)]
    bk = [[-1] * CELLS for _ in range(K + 1)]
    for j in range(CELLS):
        d[1][j] = cost(0, j)
    for k in range(2, K + 1):
        for j in range(k - 1, CELLS):
            best, arg = INF, -1
            for i in range(k - 2, j):
                v = d[k - 1][i] + cost(i + 1, j)
                if v < best:              # strict: ties keep smaller i
                    best, arg = v, i
            d[k][j] = best
            bk[k][j] = arg

    rows = []
    e = CELLS - 1
    for k in range(K, 0, -1):
        s_ = bk[k][e] + 1 if k > 1 else 0
        rows.append({"seg": k, "start_cell": s_, "end_cell": e,
                     "cost_micro": cost(s_, e)})
        e = s_ - 1
    rows.reverse()
    return pd.DataFrame(rows).astype("int64")


def q_knapsack_sources(sf_dir: str):
    """0/1 KNAPSACK source selection: choose whole sources maximizing
    total DISTINCT-trigram value under a token budget of half the
    corpus (weights in 100-token units, floor) — the exact-optimization
    complement of q_token_waterfill's fractional caps and
    q_coverage_select's greedy. Weights/values are two combiner passes
    (token counts; per-source distinct trigram counts via one
    (source, trigram)-keyed exchange); the m×C DP table is exact
    integers, ties resolved by NOT taking (d_take must strictly beat
    d_skip), items processed in source-name order — the unrolled
    recursive-CTE twin replays both the forward table and the
    backtrack. Output: (source, w_units, value, chosen)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.window import (
        hash_agg, map_key_partitions, segment_lengths, segment_starts)

    UNIT = 100

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["source", "text"])

    def tok_counts(t: pa.Table) -> pa.Table:
        nt = pc.cast(pc.count_substring_regex(
            t.column("text"), pattern=r"\S+"), pa.int64())
        out = pa.table({"source": t.column("source"), "nt": nt})
        return out.group_by(["source"]).aggregate(
            [("nt", "sum")]).rename_columns(["source", "nt"])

    toks = hash_agg(docs.map_batches(tok_counts,
                                     batch_format="pyarrow"),
                    "source", [("nt", "sum", "nt")]).to_pandas()

    def tri_pairs(t: pa.Table) -> pa.Table:
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
                             "source": pa.array([], pa.string())})
        parts = [flat.slice(i, ntok - 2) for i in range(3)]
        ngrams = pc.binary_join_element_wise(*parts, " ")
        pnp = parent.to_numpy(zero_copy_only=False)
        same = pa.array(pnp[:ntok - 2] == pnp[2:])
        ngrams = ngrams.filter(same)
        src = t.column("source").take(pa.array(
            pnp[:ntok - 2][same.to_numpy(zero_copy_only=False)]))
        g = pa.table({"ng": ngrams, "source": src}).group_by(
            ["ng", "source"]).aggregate([])
        return g

    def distinct_count(t: pa.Table) -> pa.Table:
        ng = t.column("ng").to_numpy(zero_copy_only=False)
        if not len(ng):
            return pa.table({"source": pa.array([], pa.string()),
                             "v": pa.array([], pa.int64())})
        src = t.column("source").to_numpy(zero_copy_only=False)
        # rows sorted by ng: factorize both sides to ints, dedup pairs
        starts = segment_starts(ng)
        lens = segment_lengths(starts, len(ng))
        ngidx = np.repeat(np.arange(len(starts), dtype=np.int64), lens)
        usrc, sidx = np.unique(src, return_inverse=True)
        pk = ngidx * np.int64(len(usrc)) + sidx
        upk = np.unique(pk)
        uu, cnt = np.unique(upk % np.int64(len(usrc)),
                            return_counts=True)
        return pa.table({"source": pa.array(usrc[uu], pa.string()),
                         "v": pa.array(cnt.astype(np.int64),
                                       pa.int64())})

    vals = hash_agg(
        map_key_partitions(
            docs.map_batches(tri_pairs, batch_format="pyarrow"),
            "ng", distinct_count, coalesce_rows=262144,
            producer_expands=True),
        "source", [("v", "sum", "v")]).to_pandas()

    st = toks.set_index("source").join(
        vals.set_index("source"), how="outer").fillna(0).astype(
        "int64").sort_index()
    srcs = st.index.tolist()
    w = [int(x) // UNIT for x in st["nt"]]
    v = [int(x) for x in st["v"]]
    cap = (int(st["nt"].sum()) // 2) // UNIT
    m = len(srcs)

    prev = [0] * (cap + 1)
    rows_d = [prev[:]]
    for i in range(m):
        cur = prev[:]
        wi, vi = w[i], v[i]
        for c in range(wi, cap + 1):
            cand = prev[c - wi] + vi
            if cand > cur[c]:          # strict: tie keeps skip
                cur[c] = cand
        rows_d.append(cur)
        prev = cur
    chosen = [0] * m
    c = cap
    for i in range(m - 1, -1, -1):
        if rows_d[i + 1][c] != rows_d[i][c]:
            chosen[i] = 1
            c -= w[i]
    return pd.DataFrame({
        "source": srcs,
        "w_units": pd.Series(w, dtype="int64"),
        "value": pd.Series(v, dtype="int64"),
        "chosen": pd.Series(chosen, dtype="int64")})


def q_theil_index(sf_dir: str):
    """THEIL T INEQUALITY decomposition of doc lengths: the total index
    T = (1/n)Σ (x/μ)ln(x/μ), its between-source component
    Σ shareᵢ·ln(μᵢ/μ), and each source's within component — the
    inequality diagnostic whose between/within split tells you whether
    length skew lives ACROSS sources or INSIDE them (Gini can't
    decompose). Every log term is computed per row / per source from
    exact integer (x, nᵢ, Sᵢ, n, S) in one fixed operation order and
    floored to nanos BEFORE any sum (the nano-nat idiom); sums are
    exact int64; the final divide-by-count is integer. Components are
    emitted as computed — the float decomposition identity holds only
    approximately at nano grain and is asserted loosely in pytest.
    One stats combiner + one streaming row pass."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray

    from magic_content_extractor_ray.stages.window import hash_agg

    docs = _read_pq(f"{sf_dir}/documents.parquet",
                    columns=["source", "n_chars"])

    def pre(t: pa.Table) -> pa.Table:
        v = pc.cast(t.column("n_chars"), pa.int64())
        out = pa.table({"source": t.column("source"), "s": v,
                        "n": pa.array(np.ones(len(t), np.int64),
                                      pa.int64())})
        return out.group_by(["source"]).aggregate(
            [("s", "sum"), ("n", "sum")]).rename_columns(
            ["source", "s", "n"])

    st = hash_agg(docs.map_batches(pre, batch_format="pyarrow"),
                  "source", [("s", "sum", "s"), ("n", "sum", "n")]
                  ).to_pandas().sort_values("source")
    S = int(st["s"].sum())
    N = int(st["n"].sum())
    info = {r.source: (int(r.s), int(r.n))
            for r in st.itertuples(index=False)}
    iref = ray.put(info)

    def row_terms(t: pa.Table, _i=iref) -> pa.Table:
        inf = ray.get(_i)
        src = t.column("source").to_numpy(zero_copy_only=False)
        x = t.column("n_chars").to_numpy(
            zero_copy_only=False).astype(np.int64)
        si = np.array([inf[s][0] for s in src], np.int64)
        ni = np.array([inf[s][1] for s in src], np.int64)
        tw = x.astype(np.float64) * ni / si          # x/μᵢ
        tg = x.astype(np.float64) * N / S            # x/μ
        wn = np.floor(tw * np.log(tw) * 1e9 + 0.5).astype(np.int64)
        gn = np.floor(tg * np.log(tg) * 1e9 + 0.5).astype(np.int64)
        us, inv = np.unique(src, return_inverse=True)
        return pa.table({
            "source": pa.array(us, pa.string()),
            "w": pa.array(_bincount_i64(inv, wn, minlength=len(us)),
                          pa.int64()),
            "g": pa.array(_bincount_i64(inv, gn, minlength=len(us)),
                          pa.int64())})

    sums = hash_agg(docs.map_batches(row_terms, batch_format="pyarrow"),
                    "source", [("w", "sum", "w"), ("g", "sum", "g")]
                    ).to_pandas().sort_values("source")

    import math

    rows = []
    g_total = 0
    between = 0
    for r in sums.itertuples(index=False):
        si, ni = info[r.source]
        rows.append({"scope": "within", "source": r.source,
                     "t_nano": int(r.w) // ni})
        g_total += int(r.g)
        share = si / S
        ratio = (si * N) / (S * ni)
        between += int(math.floor(share * math.log(ratio) * 1e9 + 0.5))
    rows.append({"scope": "between", "source": "*", "t_nano": between})
    rows.append({"scope": "total", "source": "*",
                 "t_nano": g_total // N})
    return pd.DataFrame(rows).astype({"t_nano": "int64"}).sort_values(
        ["scope", "source"]).reset_index(drop=True)


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


def _voptimal_oracle(cells: int = 64, k: int = 8) -> str:
    """Unrolled V-optimal DP twin of q_voptimal_histogram: exact
    HUGEINT prefix sums → micro-floored per-segment costs → k rounds of
    the split DP with (cost asc, split asc) argmin, then a backpointer
    walk emitting the k segments."""
    parts = [
        "WITH mmx AS (SELECT CAST(min(n_chars) AS BIGINT) AS mn, "
        "CAST(max(n_chars) AS BIGINT) AS mx FROM documents), "
        "cl AS (SELECT (CAST(n_chars AS BIGINT) - (SELECT mn FROM mmx)) "
        f"* {cells} // ((SELECT mx - mn + 1 FROM mmx)) AS cell, "
        "CAST(n_chars AS BIGINT) AS v FROM documents), "
        "ag AS (SELECT cell, CAST(count(*) AS HUGEINT) AS c, "
        "CAST(sum(v) AS HUGEINT) AS s, CAST(sum(v * v) AS HUGEINT) AS q "
        "FROM cl GROUP BY 1), "
        f"grid AS (SELECT CAST(t.i AS BIGINT) AS cell FROM "
        f"range({cells}) t(i)), "
        "fc AS MATERIALIZED (SELECT g.cell, COALESCE(a.c, 0) AS c, "
        "COALESCE(a.s, 0) AS s, COALESCE(a.q, 0) AS q FROM grid g "
        "LEFT JOIN ag a USING (cell)), "
        "pre AS MATERIALIZED (SELECT cell, "
        "sum(c) OVER (ORDER BY cell) AS pc, "
        "sum(s) OVER (ORDER BY cell) AS ps, "
        "sum(q) OVER (ORDER BY cell) AS pq FROM fc), "
        "seg AS MATERIALIZED (SELECT g.cell AS i, j.cell AS j, "
        "CASE WHEN (j.pc - COALESCE(p0.pc, 0)) = 0 THEN 0 ELSE "
        "(((j.pc - COALESCE(p0.pc, 0)) * (j.pq - COALESCE(p0.pq, 0)) "
        "- (j.ps - COALESCE(p0.ps, 0)) * (j.ps - COALESCE(p0.ps, 0))) "
        "* 1000000) // (j.pc - COALESCE(p0.pc, 0)) END AS cost "
        "FROM grid g JOIN pre j ON j.cell >= g.cell "
        "LEFT JOIN pre p0 ON p0.cell = g.cell - 1), "
        "d1 AS MATERIALIZED (SELECT j, cost AS d FROM seg WHERE i = 0)"]
    for r in range(2, k + 1):
        parts.append(
            f", d{r} AS MATERIALIZED (SELECT j, d, bi FROM ("
            f"SELECT s2.j AS j, p.d + s2.cost AS d, p.j AS bi, "
            f"row_number() OVER (PARTITION BY s2.j "
            f"ORDER BY p.d + s2.cost, s2.i) AS rn "
            f"FROM d{r-1} p JOIN seg s2 ON s2.i = p.j + 1) WHERE rn = 1)")
    # backpointer walk: e_k chain as scalar CTEs
    parts.append(f", e{k} AS (SELECT CAST({cells - 1} AS BIGINT) AS e)")
    for r in range(k, 1, -1):
        parts.append(
            f", b{r} AS (SELECT (SELECT bi FROM d{r} "
            f"WHERE j = (SELECT e FROM e{r})) AS b)"
            f", e{r-1} AS (SELECT (SELECT b FROM b{r}) AS e)")
    sel = []
    for r in range(1, k + 1):
        start = ("CAST(0 AS BIGINT)" if r == 1
                 else f"(SELECT b FROM b{r}) + 1")
        sel.append(
            f"SELECT CAST({r} AS BIGINT) AS seg, {start} AS start_cell, "
            f"(SELECT e FROM e{r}) AS end_cell, "
            f"CAST((SELECT cost FROM seg WHERE i = {start} "
            f"AND j = (SELECT e FROM e{r})) AS BIGINT) AS cost_micro")
    parts.append(" " + " UNION ALL ".join(sel) + " ORDER BY seg")
    return "".join(parts)


_CURATION_SQL ="\nWITH d0 AS (SELECT doc_id, source, text,\n            CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS nt\n            FROM documents),\nq AS (SELECT doc_id, source, text, nt FROM d0 WHERE nt >= 10),\nhh AS (SELECT doc_id, source, nt, md5(text) AS h FROM q),\ndd AS MATERIALIZED (SELECT doc_id, source, nt FROM\n  (SELECT doc_id, source, nt,\n          min(doc_id) OVER (PARTITION BY h) AS md FROM hh)\n  WHERE doc_id = md),\nns AS MATERIALIZED (SELECT source, CAST(sum(nt) AS BIGINT) AS n\n                    FROM dd GROUP BY 1),\ntot AS (SELECT CAST(sum(n) // 2 AS BIGINT) AS b, count(*) AS m FROM ns),\nordered AS (SELECT source, n, row_number() OVER (ORDER BY n, source) AS k,\n            COALESCE(CAST(sum(n) OVER (ORDER BY n, source\n            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),\n            0) AS p FROM ns),\ncand AS (SELECT DISTINCT t FROM (SELECT n AS t FROM ns UNION ALL\n         SELECT greatest(0, ((SELECT b FROM tot) - p) //\n                ((SELECT m FROM tot) - k + 1)) FROM ordered)),\nev AS (SELECT c.t, CAST(sum(least(ns.n, c.t)) AS BIGINT) AS f\n       FROM cand c CROSS JOIN ns GROUP BY 1),\nts AS (SELECT COALESCE(max(t), 0) AS tstar FROM ev\n       WHERE f <= (SELECT b FROM tot)),\nlv AS (SELECT (SELECT b FROM tot) - CAST(sum(least(n,\n       (SELECT tstar FROM ts))) AS BIGINT) AS l FROM ns),\npri AS (SELECT source, row_number() OVER (ORDER BY n DESC, source) AS r\n        FROM ns WHERE n > (SELECT tstar FROM ts)),\nalloc AS MATERIALIZED (SELECT ns.source,\n        least(ns.n, (SELECT tstar FROM ts)) + CASE WHEN pri.r IS NOT NULL\n        AND pri.r <= (SELECT l FROM lv) THEN 1 ELSE 0 END AS a\n        FROM ns LEFT JOIN pri USING (source)),\ncum AS (SELECT dd.doc_id, dd.source, dd.nt,\n        COALESCE(CAST(sum(nt) OVER (PARTITION BY source ORDER BY doc_id\n        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)\n        AS cum0 FROM dd),\ncapped AS MATERIALIZED (SELECT c.doc_id, c.source, c.nt FROM cum c\n        JOIN alloc a USING (source) WHERE c.cum0 + c.nt <= a.a),\nb2 AS (SELECT doc_id, source, nt,\n       CAST(ntile(10) OVER (ORDER BY nt, doc_id) AS BIGINT) AS decile\n       FROM capped),\nr2 AS (SELECT doc_id, source, nt, decile,\n       row_number() OVER (PARTITION BY decile, source\n       ORDER BY nt, doc_id) - 1 AS rr FROM b2)\nSELECT doc_id, source, nt AS n_tokens,\n       CAST(row_number() OVER (ORDER BY decile, rr, source) - 1\n       AS BIGINT) AS position\nFROM r2 ORDER BY doc_id"


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    return q_extract_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_pipeline": q_extract_pipeline,
        "extract_spans": q_extract_spans,
        "extract_goldens": q_extract_goldens,
        "extract_formats": q_extract_formats,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_ngram": q_dedup_ngram,
        "cross_dedup": q_cross_dedup,
        "dedup_embedding": q_dedup_embedding,
        "token_count": q_token_count,
        "pii_redacted": q_pii_redacted,
        "pack_sequences": q_pack_sequences,
        "quality_counts": q_quality_counts,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "source_chars_quantiles": q_source_chars_quantiles,
        "orders_rollup": q_orders_rollup,
        "top_terms": q_top_terms,
        "stratified_sample": q_stratified_sample,
        "importance_sample": q_importance_sample,
        "quality_pruned": q_quality_pruned,
        "clean_text": q_clean_text,
        "funnel_counts": q_funnel_counts,
        "retention_cohorts": q_retention_cohorts,
        "shipping_priority": q_shipping_priority,
        "regional_revenue": q_regional_revenue,
        "covisitation": q_covisitation,
        "centroid_assign": q_centroid_assign,
        "quality_percentile": q_quality_percentile,
        "inverted_index": q_inverted_index,
        "repetition_stats": q_repetition_stats,
        "doc_frequency": q_doc_frequency,
        "token_histogram": q_token_histogram,
        "sliding_events": q_sliding_events,
        "lang_median_chars": q_lang_median_chars,
        "top_docs_per_lang": q_top_docs_per_lang,
        "customers_no_purchases": q_customers_no_purchases,
        "customer_order_counts": q_customer_order_counts,
        "user_paths": q_user_paths,
        "event_gaps": q_event_gaps,
        "running_order_total": q_running_order_total,
        "events_pivot": q_events_pivot,
        "users_intersect": q_users_intersect,
        "purchase_days_clean": q_purchase_days_clean,
        "active_days": q_active_days,
        "chars_quartiles": q_chars_quartiles,
        "heavy_terms": q_heavy_terms,
        "token_offsets": q_token_offsets,
        "sample_fixed": q_sample_fixed,
        "orders_cube": q_orders_cube,
        "sample_per_lang": q_sample_per_lang,
        "daily_view_purchase": q_daily_view_purchase,
        "lang_chars_var": q_lang_chars_var,
        "embedding_norms": q_embedding_norms,
        "doc_char_rank": q_doc_char_rank,
        "epoch_shuffle": q_epoch_shuffle,
        "customers_with_purchases": q_customers_with_purchases,
        "suppliers_by_region": q_suppliers_by_region,
        "orders_monthly": q_orders_monthly,
        "lineitem_corr": q_lineitem_corr,
        "brand_revenue": q_brand_revenue,
        "event_value_totals": q_event_value_totals,
        "split_assignments": q_split_assignments,
        "supplier_ship_volumes": q_supplier_ship_volumes,
        "recent_orders": q_recent_orders,
        "top_terms_per_lang": q_top_terms_per_lang,
        "session_durations": q_session_durations,
        "doc_chunks": q_doc_chunks,
        "chunk_dedup": q_chunk_dedup,
        "docs_decontaminated": q_docs_decontaminated,
        "label_centroids": q_label_centroids,
        "tfidf_terms": q_tfidf_terms,
        "collocations": q_collocations,
        "last_event_per_user": q_last_event_per_user,
        "supplier_nation": q_supplier_nation,
        "lineitem_revenue": q_lineitem_revenue,
        "lang_stats": q_lang_stats,
        "top_docs": q_top_docs,
        "long_docs": q_long_docs,
        "source_stats": q_source_stats,
        "events_by_type": q_events_by_type,
        "lineitem_pricing": q_lineitem_pricing,
        "event_props": q_event_props,
        "page_rank": q_page_rank,
        "source_mixture": q_source_mixture,
        "events_hourly": q_events_hourly,
        "events_by_segment": q_events_by_segment,
        "user_sessions": q_user_sessions,
        "asof_join": q_asof_join,
        "distinct_users": q_distinct_users,
        "orders_by_segment": q_orders_by_segment,
        "ann_topk": q_ann_topk,
        "ann_filtered": q_ann_filtered,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "views_before_click": q_views_before_click,
        "training_pipeline": q_training_pipeline,
        "embedding_clusters": q_embedding_clusters,
        "extract_metrics": q_extract_metrics,
        "extract_readability": q_extract_readability,
        "media_features": q_media_features,
        "audio_features": q_audio_features,
        "distinct_users_approx": q_distinct_users_approx,
        "checkpoint_lineage": q_checkpoint_lineage,
        "dup_passages": q_dup_passages,
        "eval_overlap": q_eval_overlap,
        "word_entropy": q_word_entropy,
        "big_orders": q_big_orders,
        "semantic_dedup": q_semantic_dedup,
        "chars_quantiles_approx": q_chars_quantiles_approx,
        "mode_source": q_mode_source,
        "bm25_topk": q_bm25_topk,
        "daily_revenue_ma7": q_daily_revenue_ma7,
        "item_triangles": q_item_triangles,
        "weighted_sample": q_weighted_sample,
        "lang_chars_quantiles": q_lang_chars_quantiles,
        "lm_scores": q_lm_scores,
        "lang_source_pmi": q_lang_source_pmi,
        "intra_dup_ngrams": q_intra_dup_ngrams,
        "dedup_keep_best": q_dedup_keep_best,
        "quality_classifier": q_quality_classifier,
        "winnow_fingerprints": q_winnow_fingerprints,
        "table_profile": q_table_profile,
        "value_outliers": q_value_outliers,
        "spearman_qty_price": q_spearman,
        "mad_outliers": q_mad_outliers,
        "source_drift_kl": q_source_drift_kl,
        "value_trend": q_value_trend,
        "cumulative_users": q_cumulative_users,
        "segment_gini": q_segment_gini,
        "term_cms": q_term_cms,
        "title_fuzzy": q_title_fuzzy,
        "dense_rank_docs": q_dense_rank_docs,
        "concurrent_sessions": q_concurrent_sessions,
        "bpe_pairs": q_bpe_pairs,
        "hybrid_rrf": q_hybrid_rrf,
        "weekly_churn": q_weekly_churn,
        "revenue_forecast": q_revenue_forecast,
        "promo_revenue": q_promo_revenue,
        "customer_distribution": q_customer_distribution,
        "top_supplier": q_top_supplier,
        "idle_customer_balance": q_idle_customer_balance,
        "nation_trade_volume": q_nation_trade_volume,
        "market_share": q_market_share,
        "returned_items": q_returned_items,
        "pareto_orders": q_pareto_orders,
        "item_bfs": q_item_bfs,
        "pricing_summary": q_pricing_summary,
        "readability": q_readability,
        "weighted_median": q_weighted_median,
        "conversion_lag": q_conversion_lag,
        "source_ks": q_source_ks,
        "event_transitions": q_event_transitions,
        "rfm_segments": q_rfm_segments,
        "classifier_auc": q_classifier_auc,
        "dedup_overlap": q_dedup_overlap,
        "benford_digits": q_benford_digits,
        "stickiness": q_stickiness,
        "revenue_autocorr": q_revenue_autocorr,
        "lang_source_chi2": q_lang_source_chi2,
        "media_thumbnails": q_media_thumbnails,
        "small_qty_revenue": q_small_qty_revenue,
        "brand_band_revenue": q_brand_band_revenue,
        "item_neighbors": q_item_neighbors,
        "session_bounds": q_session_bounds,
        "revenue_concentration": q_revenue_concentration,
        "item_components": q_item_components,
        "audio_spectral": q_audio_spectral,
        "image_phash": q_image_phash,
        "rolling_active_users": q_rolling_active_users,
        "dup_size_histogram": q_dup_size_histogram,
        "fulfillment_lag": q_fulfillment_lag,
        "priority_late_orders": q_priority_late_orders,
        "slow_suppliers": q_slow_suppliers,
        "user_entropy": q_user_entropy,
        "vocab_growth": q_vocab_growth,
        "embedding_covariance": q_embedding_covariance,
        "fk_violations": q_fk_violations,
        "doc_novelty": q_doc_novelty,
        "term_keyness": q_term_keyness,
        "bpe_train": q_bpe_train,
        "truncation_twins": q_truncation_twins,
        "last_touch_attribution": q_last_touch_attribution,
        "upsert_orders": q_upsert_orders,
        "cheapest_supplier": q_cheapest_supplier,
        "product_profit": q_product_profit,
        "important_parts": q_important_parts,
        "shipmode_priority": q_shipmode_priority,
        "part_supplier_variety": q_part_supplier_variety,
        "promotion_suppliers": q_promotion_suppliers,
        "qty_price_slope": q_qty_price_slope,
        "k_anonymity": q_k_anonymity,
        "segment_ttest": q_segment_ttest,
        "event_bursts": q_event_bursts,
        "sorted_neighbor_dups": q_sorted_neighbor_dups,
        "winsorized_chars": q_winsorized_chars,
        "assoc_rules": q_assoc_rules,
        "geo_mean_chars": q_geo_mean_chars,
        "time_weighted_value": q_time_weighted_value,
        "bounce_rate": q_bounce_rate,
        "vocab_jaccard_langs": q_vocab_jaccard_langs,
        "score_calibration": q_score_calibration,
        "cross_source_dups": q_cross_source_dups,
        "user_recs": q_user_recs,
        "embedding_dim_median": q_embedding_dim_median,
        "improving_users": q_improving_users,
        "revenue_changepoint": q_revenue_changepoint,
        "source_ttr": q_source_ttr,
        "trailing_spend": q_trailing_spend,
        "merge_orders": q_merge_orders,
        "smb_join_revenue": q_smb_join_revenue,
        "rapid_reorders": q_rapid_reorders,
        "item_abandonment": q_item_abandonment,
        "events_grouping_sets": q_events_grouping_sets,
        "weekday_revenue": q_weekday_revenue,
        "fim_split": q_fim_split,
        "exact_median_price": q_exact_median_price,
        "linear_attribution": q_linear_attribution,
        "dp_lang_counts": q_dp_lang_counts,
        "event_debounce": q_event_debounce,
        "link_prediction": q_link_prediction,
        "revenue_trend_mk": q_revenue_trend_mk,
        "revenue_ewma": q_revenue_ewma,
        "event_trigrams": q_event_trigrams,
        "ltv_cohort_curve": q_ltv_cohort_curve,
        "lang_chars_moments": q_lang_chars_moments,
        "degree_assortativity": q_degree_assortativity,
        "scd2_history": q_scd2_history,
        "event_rle": q_event_rle,
        "media_dimensions": q_media_dimensions,
        "zonemap_prune": q_zonemap_prune,
        "funnel_1h": q_funnel_1h,
        "kcore_items": q_kcore_items,
        "mutual_nn": q_mutual_nn,
        "monthly_seasonality": q_monthly_seasonality,
        "assoc_triples": q_assoc_triples,
        "jaccard_histogram": q_jaccard_histogram,
        "survival_km": q_survival_km,
        "late_events": q_late_events,
        "ndcg_eval": q_ndcg_eval,
        "nucleus_vocab": q_nucleus_vocab,
        "phrase_search": q_phrase_search,
        "title_entity_clusters": q_title_entity_clusters,
        "popularity_hitrate": q_popularity_hitrate,
        "ht_estimate": q_ht_estimate,
        "bootstrap_ci": q_bootstrap_ci,
        "index_compression": q_index_compression,
        "hll_twin": q_hll_twin,
        "cdc_chunks": q_cdc_chunks,
        "lang_cross_entropy": q_lang_cross_entropy,
        "zipf_slope": q_zipf_slope,
        "burst_viterbi": q_burst_viterbi,
        "audio_metadata": q_audio_metadata,
        "item_cheapest_path": q_item_cheapest_path,
        "edge_churn": q_edge_churn,
        "l_diversity": q_l_diversity,
        "apportion_sample": q_apportion_sample,
        "sq8_topk": q_sq8_topk,
        "kcenter_sample": q_kcenter_sample,
        "dict_encoding": q_dict_encoding,
        "t_closeness": q_t_closeness,
        "mannwhitney": q_mannwhitney,
        "dup_spans": q_dup_spans,
        "pca_power": q_pca_power,
        "random_walks": q_random_walks,
        "negative_samples": q_negative_samples,
        "decayed_popularity": q_decayed_popularity,
        "mst_coview": q_mst_coview,
        "textrank_keywords": q_textrank_keywords,
        "label_propagation": q_label_propagation,
        "hard_negatives": q_hard_negatives,
        "dedup_safe_folds": q_dedup_safe_folds,
        "quantile_normalize": q_quantile_normalize,
        "bpe_encode": q_bpe_encode,
        "hbos_outliers": q_hbos_outliers,
        "conformal_interval": q_conformal_interval,
        "token_waterfill": q_token_waterfill,
        "mmr_select": q_mmr_select,
        "length_emd": q_length_emd,
        "isotonic_calibration": q_isotonic_calibration,
        "curriculum_order": q_curriculum_order,
        "padding_waste": q_padding_waste,
        "rank_rbo": q_rank_rbo,
        "clustering_coefficient": q_clustering_coefficient,
        "markov_stationary": q_markov_stationary,
        "join_cardinality_model": q_join_cardinality_model,
        "oov_rate": q_oov_rate,
        "pps_systematic": q_pps_systematic,
        "hill_tail": q_hill_tail,
        "gini_split": q_gini_split,
        "term_burstiness": q_term_burstiness,
        "coverage_select": q_coverage_select,
        "curation_pipeline": q_curation_pipeline,
        "good_turing": q_good_turing,
        "join_order_costs": q_join_order_costs,
        "shapley_coverage": q_shapley_coverage,
        "modularity": q_modularity,
        "runs_test": q_runs_test,
        "heaps_fit": q_heaps_fit,
        "lead_lag": q_lead_lag,
        "video_framesample": q_video_framesample,
        "jonckheere": q_jonckheere,
        "james_stein": q_james_stein,
        "lttb_downsample": q_lttb_downsample,
        "sprt_crossing": q_sprt_crossing,
        "lis_revenue": q_lis_revenue,
        "voptimal_histogram": q_voptimal_histogram,
        "knapsack_sources": q_knapsack_sources,
        "theil_index": q_theil_index,
    }


_SQ8_CODES_SQL = (
    "WITH ex AS (SELECT vec_id, CAST(t.i + 1 AS BIGINT) AS dim, "
    "CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE) AS val "
    "FROM embeddings, range(64) t(i)), "
    "grid AS (SELECT dim, min(val) AS mn, max(val) AS mx "
    "FROM ex GROUP BY 1)")


def _kcenter_oracle(k: int = 8) -> str:
    """Unrolled greedy k-center twin: round i's centroid = argmax of the
    running min-distance map d(i−1) (ties: vec_id asc), then the map
    folds in distances to the new centroid via LEAST. Same int codes,
    same integer squared-L2 as stages/ann.kcenter_select."""
    parts = [
        _SQ8_CODES_SQL,
        ", codes AS (SELECT vec_id, ex.dim, CASE WHEN mx = mn THEN 0 "
        "ELSE CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT) END "
        "AS code FROM ex JOIN grid ON grid.dim = ex.dim), "
        "c1 AS (SELECT min(vec_id) AS vid FROM codes), "
        "d1 AS (SELECT c.vec_id, CAST(sum((c.code - x.code) * "
        "(c.code - x.code)) AS BIGINT) AS d FROM codes c JOIN codes x "
        "ON x.dim = c.dim AND x.vec_id = (SELECT vid FROM c1) "
        "GROUP BY 1)"]
    for i in range(2, k + 1):
        parts.append(
            f", c{i} AS (SELECT vec_id AS vid, d FROM d{i-1} "
            f"ORDER BY d DESC, vec_id LIMIT 1)")
        if i < k:
            parts.append(
                f", d{i} AS (SELECT p.vec_id, LEAST(p.d, s.d) AS d "
                f"FROM d{i-1} p JOIN (SELECT c.vec_id, "
                f"CAST(sum((c.code - x.code) * (c.code - x.code)) "
                f"AS BIGINT) AS d FROM codes c JOIN codes x "
                f"ON x.dim = c.dim AND x.vec_id = "
                f"(SELECT vid FROM c{i}) GROUP BY 1) s "
                f"ON s.vec_id = p.vec_id)")
    parts.append(
        " SELECT CAST(1 AS BIGINT) AS round, "
        "(SELECT vid FROM c1) AS vec_id, CAST(0 AS BIGINT) AS dist_sq")
    for i in range(2, k + 1):
        parts.append(f" UNION ALL SELECT {i}, vid, d FROM c{i}")
    parts.append(" ORDER BY round")
    return "".join(parts)


def _pca_power_oracle(squarings: int = 10) -> str:
    """Unrolled matrix-squaring twin of q_pca_power: exact HUGEINT
    covariance numerators -> +-10^6-grid normalize (round-half-away via
    positive floor division) -> ``squarings`` integer matrix-squaring +
    renormalize rounds -> row sums (M . 1) -> final normalize + sign
    canonicalization on the first nonzero loading. Every CTE is
    MATERIALIZED: DuckDB inlines plain CTEs, and a chained self-join
    would otherwise expand the plan exponentially."""
    RND = ("CASE WHEN (SELECT m FROM {m}) = 0 THEN 0 "
           "WHEN {x} >= 0 THEN (2 * {x} * 1000000 + (SELECT m FROM {m})) "
           "// (2 * (SELECT m FROM {m})) "
           "ELSE -((2 * (-({x})) * 1000000 + (SELECT m FROM {m})) "
           "// (2 * (SELECT m FROM {m}))) END")
    parts = [
        "WITH q AS MATERIALIZED (SELECT vec_id, t.i AS i, "
        "CAST(round(CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE) "
        "* 1000000) AS BIGINT) AS v FROM embeddings, range(64) t(i)), "
        "p AS MATERIALIZED (SELECT a.i AS i, b.i AS j, count(*) AS n, "
        "sum(CAST(a.v AS HUGEINT) * b.v) AS sxy, "
        "sum(CAST(a.v AS HUGEINT)) AS sx, "
        "sum(CAST(b.v AS HUGEINT)) AS sy "
        "FROM q a JOIN q b ON a.vec_id = b.vec_id GROUP BY 1, 2), "
        "nm AS MATERIALIZED (SELECT i, j, "
        "CAST(n AS HUGEINT) * sxy - sx * sy AS num FROM p), "
        "mx AS MATERIALIZED (SELECT max(abs(num)) AS m FROM nm), "
        "c0 AS MATERIALIZED (SELECT i, j, "
        + RND.format(m="mx", x="num") + " AS c FROM nm)"]
    for k in range(1, squarings + 1):
        parts.append(
            f", w{k} AS MATERIALIZED (SELECT a.i AS i, b.j AS j, "
            f"sum(a.c * b.c) AS w FROM c{k-1} a JOIN c{k-1} b "
            f"ON a.j = b.i GROUP BY 1, 2)"
            f", m{k} AS MATERIALIZED (SELECT max(abs(w)) AS m FROM w{k})"
            f", c{k} AS MATERIALIZED (SELECT i, j, "
            + RND.format(m=f"m{k}", x="w") + f" AS c FROM w{k})")
    parts.append(
        f", rs AS MATERIALIZED (SELECT i, sum(c) AS w FROM c{squarings} "
        f"GROUP BY 1), "
        f"mf AS MATERIALIZED (SELECT max(abs(w)) AS m FROM rs), "
        f"vf AS MATERIALIZED (SELECT i, "
        + RND.format(m="mf", x="w") + " AS v FROM rs)"
        ", lead AS MATERIALIZED (SELECT v FROM vf WHERE v <> 0 "
        "ORDER BY i LIMIT 1) "
        "SELECT CAST(i AS BIGINT) AS i, CAST(CASE WHEN "
        "COALESCE((SELECT v FROM lead), 0) < 0 THEN -v ELSE v END "
        "AS BIGINT) AS loading FROM vf ORDER BY i")
    return "".join(parts)


def _fixture(name: str) -> str:
    import os

    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "fixtures", name)


def oracle_sql() -> dict[str, str]:
    # Two fixture-backed oracle kinds (generated by tools/make_fixtures.py,
    # frozen in git):
    # - extract_goldens reads the HAND-PINNED expected span sequences of
    #   tests/goldens.json — independent reference parity, valid at any sf.
    # - the sf0_01/ snapshots freeze the current output of queries whose
    #   semantics SQL cannot express (extraction, LSH dedup, language id,
    #   packing); they are regression oracles pinned to the driver's
    #   correctness scale (sf0.01) and anchored by the pytest golden /
    #   property suites.
    return {
        "extract_goldens": (
            'SELECT doc_id, "offset", kind, media_ref, span_text '
            f"FROM read_parquet('{_fixture('goldens_expected.parquet')}')"),
        "extract_spans": (
            'SELECT doc_id, "offset", kind, media_ref, span_text '
            f"FROM read_parquet('{_fixture('sf0_01/extract_spans.parquet')}')"),
        "extract_pipeline": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/extract_pipeline.parquet')}')"),
        "extract_formats": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/extract_formats.parquet')}')"),
        "lang_id": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/lang_id.parquet')}')"),
        "dedup_minhash": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/dedup_minhash.parquet')}')"),
        "cross_dedup": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/cross_dedup.parquet')}')"),
        "dedup_simhash": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/dedup_simhash.parquet')}')"),
        "dedup_embedding": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/dedup_embedding.parquet')}')"),
        "pack_sequences": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/pack_sequences.parquet')}')"),
        "extract_metrics": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/extract_metrics.parquet')}')"),
        "extract_readability": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/extract_readability.parquet')}')"),
        "image_phash": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/image_phash.parquet')}')"),
        "bpe_train": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/bpe_train.parquet')}')"),
        "audio_spectral": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/audio_spectral.parquet')}')"),
        "media_thumbnails": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/media_thumbnails.parquet')}')"),
        "media_features": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/media_features.parquet')}')"),
        "audio_features": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/audio_features.parquet')}')"),
        "training_pipeline": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/training_pipeline.parquet')}')"),
        "distinct_users_approx": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/distinct_users_approx.parquet')}')"),
        "checkpoint_lineage": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/checkpoint_lineage.parquet')}')"),
        "embedding_clusters": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/embedding_clusters.parquet')}')"),
        "ann_lsh": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/ann_lsh.parquet')}')"),
        "ann_ivf": (
            "SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/ann_ivf.parquet')}')"),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, "
            "count(*) AS n_dups FROM documents GROUP BY md5(text)"),
        "dedup_ngram": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            df AS (SELECT ng, count(*) AS c FROM ngrams GROUP BY ng),
            surv AS (SELECT n.doc_id, n.ng FROM ngrams n
                     JOIN df USING (ng) WHERE df.c <= 32),
            sizes AS (SELECT doc_id, count(*) AS sz FROM surv
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     count(*) AS n_common
              FROM surv a JOIN surv b
                ON a.ng = b.ng AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.left_id, i.right_id, i.n_common,
                   round(i.n_common / (sa.sz + sb.sz - i.n_common), 6)
                     AS jaccard
            FROM inter i JOIN sizes sa ON sa.doc_id = i.left_id
                         JOIN sizes sb ON sb.doc_id = i.right_id
            WHERE i.n_common / (sa.sz + sb.sz - i.n_common) >= 0.4""",
        "dedup_overlap": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            df AS (SELECT ng, count(*) AS c FROM ngrams GROUP BY ng),
            surv AS (SELECT n.doc_id, n.ng FROM ngrams n
                     JOIN df USING (ng) WHERE df.c <= 32),
            sizes AS (SELECT doc_id, count(*) AS sz FROM surv
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     count(*) AS n_common
              FROM surv a JOIN surv b
                ON a.ng = b.ng AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT i.left_id, i.right_id, i.n_common,
                   round(i.n_common / least(sa.sz, sb.sz), 6) AS overlap
            FROM inter i JOIN sizes sa ON sa.doc_id = i.left_id
                         JOIN sizes sb ON sb.doc_id = i.right_id
            WHERE i.n_common / least(sa.sz, sb.sz) >= 0.8""",
        "token_count": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+')) AS n_tokens "
            "FROM documents"),
        "pii_redacted": r"""
            WITH aug AS (
              SELECT doc_id,
                text || ' contact: user' || doc_id
                     || '@example.com from 10.0.' || (doc_id % 256) || '.'
                     || (doc_id % 100) || ' call 555-'
                     || (100 + doc_id % 900) || '-'
                     || (1000 + doc_id % 9000) AS t
              FROM documents)
            SELECT doc_id,
              len(regexp_extract_all(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
              len(regexp_extract_all(t,
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
              len(regexp_extract_all(t,
                '\b\d{3}[- ]\d{3}[- ]\d{4}\b')) AS n_phone,
              regexp_replace(regexp_replace(regexp_replace(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
                '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
                '\b\d{3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g')
                AS text_redacted
            FROM aug""",
        "quality_counts": (
            "SELECT doc_id, length(text) AS n_chars_q, "
            "len(regexp_extract_all(text, '[A-Za-z]')) AS n_alpha, "
            "len(regexp_extract_all(text, '[0-9]')) AS n_digit, "
            "len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct, "
            f"len(regexp_extract_all(text, '\\b({_STOPWORD_ALT})\\b')) "
            "AS n_stopword FROM documents"),
        "fingerprint": (
            "SELECT doc_id, md5(trim(regexp_replace(lower(text), "
            "'\\s+', ' ', 'g'))) AS fingerprint FROM documents"),
        "source_chars_quantiles": (
            "SELECT source, quantile_cont(n_chars, 0.5) AS p50_chars, "
            "quantile_cont(n_chars, 0.95) AS p95_chars "
            "FROM documents GROUP BY source ORDER BY source"),
        "orders_rollup": (
            "SELECT COALESCE(o_orderstatus, 'ALL') AS status, "
            "COALESCE(o_orderpriority, 'ALL') AS priority, "
            "count(*) AS n FROM orders "
            "GROUP BY ROLLUP(o_orderstatus, o_orderpriority) "
            "ORDER BY status, priority"),
        "top_terms": (
            "SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, word) "
            "AS BIGINT) AS rnk, word AS term, count(*) AS n FROM ("
            "SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS word "
            "FROM documents) GROUP BY word "
            "ORDER BY n DESC, term LIMIT 100"),
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents WHERE "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
            "% 100 < (CASE lang WHEN 'en' THEN 50 WHEN 'de' THEN 30 "
            "ELSE 10 END) ORDER BY doc_id"),
        "shipping_priority": (
            "SELECT l.l_orderkey, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, "
            "strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE c.c_mktsegment = 'BUILDING' "
            "AND o.o_orderdate < TIMESTAMP '1996-06-30' "
            "AND l.l_shipdate > TIMESTAMP '1996-06-30' "
            "GROUP BY l.l_orderkey, o.o_orderdate "
            "ORDER BY revenue_c4 DESC, o_orderdate, l_orderkey LIMIT 10"),
        "regional_revenue": (
            "SELECT n.n_name AS n_name, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4 "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "AND c.c_nationkey = s.s_nationkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "WHERE r.r_name = 'EUROPE' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1 ORDER BY revenue_c4 DESC, n_name"),
        "covisitation": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view') "
            "SELECT a.item AS item_a, b.item AS item_b, "
            "count(*) AS n_users "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item "
            "GROUP BY 1, 2 ORDER BY n_users DESC, item_a, item_b "
            "LIMIT 50"),
        "centroid_assign": (
            "WITH x AS (SELECT vec_id, label, "
            "generate_subscripts(embedding, 1) AS dim, "
            "CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) "
            "AS BIGINT) AS xm FROM embeddings), "
            "c AS (SELECT label, dim, CAST(floor("
            "(2.0 * sum(xm) + count(*)) / (2.0 * count(*))) AS BIGINT) "
            "AS cm FROM x GROUP BY 1, 2), "
            "d AS (SELECT x.vec_id, c.label, "
            "CAST(sum((x.xm - c.cm) * (x.xm - c.cm)) AS BIGINT) AS dist "
            "FROM x JOIN c USING (dim) GROUP BY 1, 2) "
            "SELECT vec_id, label AS pred_label, dist AS dist_sq "
            "FROM (SELECT *, row_number() OVER (PARTITION BY vec_id "
            "ORDER BY dist, label) AS rn FROM d) WHERE rn = 1 "
            "ORDER BY vec_id"),
        "quality_percentile": (
            "WITH tok AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents) "
            "SELECT doc_id, n_tokens, CAST(floor("
            "percent_rank() OVER (ORDER BY n_tokens) * 1000000) "
            "AS BIGINT) AS pr_ppm FROM tok ORDER BY doc_id"),
        "inverted_index": (
            "WITH tf AS (SELECT t.term, d.doc_id, "
            "CAST(count(*) AS BIGINT) AS tf "
            "FROM documents d, unnest(regexp_extract_all("
            "lower(d.text), '\\S+')) AS t(term) "
            "WHERE t.term <> '' GROUP BY 1, 2) "
            "SELECT term, doc_id, tf, rn AS rank "
            "FROM (SELECT *, row_number() OVER (PARTITION BY term "
            "ORDER BY tf DESC, doc_id) AS rn FROM tf) WHERE rn <= 5 "
            "ORDER BY term, rank"),
        "retention_cohorts": (
            "WITH uw AS (SELECT DISTINCT user_id, "
            "CAST(date_trunc('week', ts) AS DATE) AS wk FROM events), "
            "c AS (SELECT user_id, min(wk) AS cohort FROM uw "
            "GROUP BY user_id) "
            "SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_week, "
            "CAST((uw.wk - c.cohort) / 7 AS BIGINT) AS week_offset, "
            "count(*) AS n_users FROM uw JOIN c USING (user_id) "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "funnel_counts": (
            "WITH f AS (SELECT user_id, "
            "min(CASE WHEN event_type = 'view' THEN ts END) AS tv, "
            "min(CASE WHEN event_type = 'click' THEN ts END) AS tc, "
            "min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp "
            "FROM events GROUP BY user_id) "
            "SELECT CAST(count(CASE WHEN tv IS NOT NULL THEN 1 END) "
            "AS BIGINT) AS n_view, "
            "CAST(count(CASE WHEN tc > tv THEN 1 END) AS BIGINT) "
            "AS n_view_click, "
            "CAST(count(CASE WHEN tc > tv AND tp > tc THEN 1 END) "
            "AS BIGINT) AS n_funnel_complete FROM f"),
        "clean_text": (
            "SELECT doc_id, "
            "trim(regexp_replace(nfc_normalize(regexp_replace(text, "
            "'[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g')), "
            "'\\s+', ' ', 'g')) AS clean_text FROM documents"),
        "quality_pruned": (
            "WITH tok AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens FROM documents), "
            "t AS (SELECT quantile_cont(n_tokens, 0.25) AS p25 FROM tok) "
            "SELECT doc_id, n_tokens FROM tok, t WHERE n_tokens > p25 "
            "ORDER BY doc_id"),
        "importance_sample": (
            "SELECT doc_id, n_tokens, "
            "least(n_tokens * 5000, 1000000) AS w_ppm FROM ("
            "SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) "
            "AS BIGINT) AS n_tokens FROM documents) WHERE "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
            "% 1000000 < least(n_tokens * 5000, 1000000) "
            "ORDER BY doc_id"),
        "doc_frequency": (
            "SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, word) "
            "AS BIGINT) AS rnk, word AS term, count(*) AS df FROM ("
            "SELECT DISTINCT doc_id, "
            "unnest(regexp_extract_all(lower(text), '\\S+')) AS word "
            "FROM documents) GROUP BY word ORDER BY df DESC, term "
            "LIMIT 50"),
        "repetition_stats": (
            "SELECT doc_id, "
            "len(regexp_extract_all(text, '\\S+')) AS n_words, "
            "len(list_distinct(regexp_extract_all(lower(text), '\\S+'))) "
            "AS n_distinct_words, "
            "length(regexp_replace(text, '\\s', '', 'g')) "
            "AS n_nonspace_chars FROM documents"),
        "token_histogram": (
            "SELECT len(regexp_extract_all(text, '\\S+')) // 10 "
            "AS token_bucket, count(*) AS n_docs FROM documents "
            "GROUP BY 1 ORDER BY 1"),
        "sliding_events": (
            "WITH h AS (SELECT event_type, "
            "CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS "
            "hour_bucket, count(*) AS n_events FROM events GROUP BY 1, 2) "
            "SELECT a.event_type, a.hour_bucket, CAST(sum(b.n_events) "
            "AS BIGINT) AS sliding_events FROM h a JOIN h b "
            "ON a.event_type = b.event_type AND b.hour_bucket "
            "BETWEEN a.hour_bucket - 2 AND a.hour_bucket "
            "GROUP BY a.event_type, a.hour_bucket"),
        "lang_median_chars": (
            "SELECT lang, median(n_chars) AS median_chars "
            "FROM documents GROUP BY lang ORDER BY lang"),
        "top_docs_per_lang": (
            "SELECT lang, rnk, doc_id, n_chars FROM ("
            "SELECT lang, doc_id, n_chars, row_number() OVER ("
            "PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk "
            "FROM documents) WHERE rnk <= 3 ORDER BY lang, rnk"),
        "customers_no_purchases": (
            "SELECT c.c_custkey FROM customer c WHERE NOT EXISTS ("
            "SELECT 1 FROM events e WHERE e.user_id = c.c_custkey "
            "AND e.event_type = 'purchase') ORDER BY c.c_custkey"),
        "user_paths": (
            "SELECT user_id, string_agg(event_type, '>' "
            "ORDER BY ts, event_id) AS path FROM events "
            "GROUP BY user_id ORDER BY user_id"),
        "event_gaps": (
            "WITH g AS (SELECT user_id, epoch_us(ts) - "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS gap FROM events) "
            "SELECT user_id, count(gap) AS n_gaps, "
            "CAST(sum(gap) AS BIGINT) AS total_gap_us, "
            "CAST(max(gap) AS BIGINT) AS max_gap_us FROM g "
            "WHERE gap IS NOT NULL GROUP BY user_id ORDER BY user_id"),
        "running_order_total": (
            "SELECT o_custkey, o_orderkey, CAST(sum(total_c) OVER ("
            "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_total_c "
            "FROM (SELECT o_custkey, o_orderkey, o_orderdate, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS total_c "
            "FROM orders) ORDER BY o_custkey, o_orderkey"),
        "events_pivot": (
            "SELECT user_id, "
            + ", ".join(
                f"CAST(sum(CASE WHEN event_type = '{et}' THEN 1 ELSE 0 "
                f"END) AS BIGINT) AS n_{et}" for et in _EVENT_TYPES)
            + " FROM events GROUP BY user_id ORDER BY user_id"),
        "users_intersect": (
            "SELECT user_id FROM ("
            "SELECT user_id FROM events WHERE event_type = 'view' "
            "INTERSECT "
            "SELECT user_id FROM events WHERE event_type = 'purchase'"
            ") ORDER BY user_id"),
        "purchase_days_clean": (
            "SELECT user_id, day_bucket FROM ("
            "SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) "
            "AS BIGINT) AS day_bucket FROM events "
            "WHERE event_type = 'purchase' "
            "EXCEPT "
            "SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) "
            "AS BIGINT) AS day_bucket FROM events "
            "WHERE event_type = 'error'"
            ") ORDER BY user_id, day_bucket"),
        "epoch_shuffle": (
            "SELECT doc_id, CAST(row_number() OVER (ORDER BY "
            "CAST(concat('0x', substr(md5(concat('epoch-0:', "
            "CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT), doc_id) "
            "AS BIGINT) AS shuffle_pos FROM documents "
            "ORDER BY shuffle_pos"),
        "doc_char_rank": (
            "SELECT doc_id, n_chars, CAST(row_number() OVER ("
            "ORDER BY n_chars, doc_id) AS BIGINT) AS rn "
            "FROM documents ORDER BY rn"),
        "embedding_norms": (
            "SELECT vec_id, CAST(sum(m * m) AS BIGINT) AS norm_sq_micro "
            "FROM (SELECT vec_id, CAST(round(CAST(unnest(embedding) "
            "AS DOUBLE) * 1000000) AS BIGINT) AS m FROM embeddings) "
            "GROUP BY vec_id ORDER BY vec_id"),
        "lang_chars_var": (
            "WITH s AS (SELECT lang, count(*) AS n, "
            "CAST(sum(n_chars) AS BIGINT) AS sx, "
            "CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx "
            "FROM documents GROUP BY lang) "
            "SELECT lang, n, round((CAST(sxx AS DOUBLE) - "
            "CAST(sx AS DOUBLE) * sx / n) / (n - 1), 6) AS var_chars "
            "FROM s ORDER BY lang"),
        "customers_with_purchases": (
            "SELECT c.c_custkey FROM customer c WHERE EXISTS ("
            "SELECT 1 FROM events e WHERE e.user_id = c.c_custkey "
            "AND e.event_type = 'purchase') ORDER BY c.c_custkey"),
        "daily_view_purchase": (
            "WITH v AS (SELECT user_id, CAST(floor(epoch_us(ts) / "
            "86400000000) AS BIGINT) AS day_bucket, count(*) AS n_views "
            "FROM events WHERE event_type = 'view' GROUP BY 1, 2), "
            "p AS (SELECT user_id, CAST(floor(epoch_us(ts) / "
            "86400000000) AS BIGINT) AS day_bucket, "
            "count(*) AS n_purchases FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1, 2) "
            "SELECT COALESCE(v.user_id, p.user_id) AS user_id, "
            "COALESCE(v.day_bucket, p.day_bucket) AS day_bucket, "
            "COALESCE(v.n_views, 0) AS n_views, "
            "COALESCE(p.n_purchases, 0) AS n_purchases "
            "FROM v FULL OUTER JOIN p ON v.user_id = p.user_id "
            "AND v.day_bucket = p.day_bucket "
            "ORDER BY user_id, day_bucket"),
        "sample_per_lang": (
            "SELECT doc_id, lang FROM ("
            "SELECT doc_id, lang, row_number() OVER ("
            "PARTITION BY lang "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 10 ORDER BY lang, doc_id"),
        "orders_cube": (
            "SELECT COALESCE(o_orderstatus, 'ALL') AS status, "
            "COALESCE(o_orderpriority, 'ALL') AS priority, "
            "count(*) AS n FROM orders "
            "GROUP BY CUBE(o_orderstatus, o_orderpriority) "
            "ORDER BY status, priority"),
        "sample_fixed": (
            "SELECT doc_id, lang FROM documents "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
            "LIMIT 50"),
        "token_offsets": (
            "SELECT doc_id, n_tokens, token_offset, "
            "token_offset // 2048 AS pack_id FROM ("
            "SELECT doc_id, n_tokens, COALESCE(CAST(sum(n_tokens) OVER ("
            "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING) AS BIGINT), 0) AS token_offset FROM ("
            "SELECT doc_id, len(regexp_extract_all(text, '\\S+')) "
            "AS n_tokens FROM documents)) ORDER BY doc_id"),
        "heavy_terms": (
            "SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, word) "
            "AS BIGINT) AS rnk, word AS term, count(*) AS n FROM ("
            "SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS word "
            "FROM documents) GROUP BY word "
            "ORDER BY n DESC, term LIMIT 20"),
        "active_days": (
            "SELECT user_id, day_bucket FROM ("
            "SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) "
            "AS BIGINT) AS day_bucket FROM events "
            "WHERE event_type = 'click' "
            "UNION "
            "SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) "
            "AS BIGINT) AS day_bucket FROM events "
            "WHERE event_type = 'purchase'"
            ") ORDER BY user_id, day_bucket"),
        "chars_quartiles": (
            "WITH t AS (SELECT quantile_cont(n_chars, 0.25) AS p25, "
            "quantile_cont(n_chars, 0.5) AS p50, "
            "quantile_cont(n_chars, 0.75) AS p75 FROM documents) "
            "SELECT CASE WHEN n_chars <= p25 THEN 1 "
            "WHEN n_chars <= p50 THEN 2 WHEN n_chars <= p75 THEN 3 "
            "ELSE 4 END AS quartile, "
            "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "count(*) AS n_docs FROM documents, t "
            "GROUP BY quartile ORDER BY quartile"),
        "suppliers_by_region": (
            "SELECT r.r_name, count(*) AS n_suppliers FROM supplier s "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r.r_name ORDER BY r.r_name"),
        "orders_monthly": (
            "SELECT o_orderstatus, "
            "CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 "
            "AS BIGINT) AS month_bucket, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS total_c, count(*) AS n_orders FROM orders "
            "GROUP BY o_orderstatus, month_bucket "
            "ORDER BY o_orderstatus, month_bucket"),
        "chunk_dedup": (
            "WITH t AS (SELECT doc_id, "
            "regexp_extract_all(text, '\\S+') AS toks, "
            "len(regexp_extract_all(text, '\\S+')) AS n FROM documents), "
            "c AS (SELECT doc_id, toks, n, CAST(CASE WHEN n <= 128 THEN 1 "
            "ELSE 1 + CAST(ceil((n - 128) / 96.0) AS BIGINT) END "
            "AS BIGINT) AS n_chunks FROM t WHERE n > 0), "
            "e AS (SELECT doc_id, toks, n, "
            "unnest(generate_series(1, n_chunks)) AS g FROM c), "
            "k AS (SELECT doc_id * 1000000 + CAST(g AS BIGINT) "
            "AS chunk_key, array_to_string(list_slice(toks, "
            "(g - 1) * 96 + 1, (g - 1) * 96 + least(128, "
            "n - (g - 1) * 96)), ' ') AS chunk_text FROM e) "
            "SELECT md5(chunk_text) AS text_hash, "
            "min(chunk_key) AS chunk_key, count(*) AS n_dups "
            "FROM k GROUP BY md5(chunk_text) ORDER BY chunk_key"),
        "docs_decontaminated": (
            "WITH b AS (SELECT array_to_string(list_slice("
            "regexp_extract_all(text, '\\S+'), 11, 18), ' ') AS phrase "
            "FROM (SELECT text FROM documents ORDER BY doc_id LIMIT 5)), "
            "bb AS (SELECT phrase FROM b WHERE phrase != '') "
            "SELECT d.doc_id FROM documents d WHERE NOT EXISTS ("
            "SELECT 1 FROM bb WHERE contains(d.text, bb.phrase)) "
            "ORDER BY d.doc_id"),
        "doc_chunks": (
            "WITH t AS (SELECT doc_id, "
            "regexp_extract_all(text, '\\S+') AS toks, "
            "len(regexp_extract_all(text, '\\S+')) AS n FROM documents), "
            "c AS (SELECT doc_id, toks, n, CAST(CASE WHEN n <= 128 THEN 1 "
            "ELSE 1 + CAST(ceil((n - 128) / 96.0) AS BIGINT) END "
            "AS BIGINT) AS n_chunks FROM t WHERE n > 0), "
            "e AS (SELECT doc_id, toks, n, "
            "unnest(generate_series(1, n_chunks)) AS g FROM c) "
            "SELECT doc_id, CAST(g AS BIGINT) AS chunk_id, "
            "CAST((g - 1) * 96 AS BIGINT) AS start_token, "
            "CAST(least(128, n - (g - 1) * 96) AS BIGINT) AS n_tokens, "
            "array_to_string(list_slice(toks, (g - 1) * 96 + 1, "
            "(g - 1) * 96 + least(128, n - (g - 1) * 96)), ' ') "
            "AS chunk_text FROM e ORDER BY doc_id, chunk_id"),
        "session_durations": (
            "WITH o AS (SELECT user_id, ts, event_id, CASE WHEN "
            "epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) > 1800000000 THEN 1 ELSE 0 END "
            "AS brk FROM events), "
            "s AS (SELECT user_id, ts, CAST(1 + sum(brk) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM o) "
            "SELECT user_id, session_id, count(*) AS n_events, "
            "CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) "
            "AS duration_us FROM s GROUP BY user_id, session_id "
            "ORDER BY user_id, session_id"),
        "top_terms_per_lang": (
            "SELECT lang, rnk, term, n FROM ("
            "SELECT lang, word AS term, count(*) AS n, "
            "CAST(row_number() OVER (PARTITION BY lang "
            "ORDER BY count(*) DESC, word) AS BIGINT) AS rnk FROM ("
            "SELECT lang, unnest(regexp_extract_all(lower(text), "
            "'\\S+')) AS word FROM documents) GROUP BY lang, word) "
            "WHERE rnk <= 5 ORDER BY lang, rnk"),
        "split_assignments": (
            "SELECT doc_id, CASE WHEN b < 90 THEN 'train' "
            "WHEN b < 95 THEN 'val' ELSE 'test' END AS split FROM ("
            "SELECT doc_id, CAST(concat('0x', substr(md5("
            "CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS b "
            "FROM documents) ORDER BY doc_id"),
        "supplier_ship_volumes": (
            "SELECT n.n_name, CAST(year(l.l_shipdate) AS BIGINT) "
            "AS ship_year, CAST(sum(CAST(l.l_quantity AS BIGINT)) "
            "AS BIGINT) AS sum_qty, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT) * "
            "CAST(round((1 + l.l_tax) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c6 FROM lineitem l "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "GROUP BY n.n_name, ship_year ORDER BY n.n_name, ship_year"),
        "event_value_totals": (
            "SELECT event_type, CAST(sum(CAST(round(value * 100) "
            "AS BIGINT)) AS BIGINT) AS total_value_c, "
            "count(*) AS n_events FROM events "
            "GROUP BY event_type ORDER BY event_type"),
        "recent_orders": (
            "SELECT o_orderkey, o_custkey, o_orderdate FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '2001-01-01' "
            "ORDER BY o_orderkey"),
        "brand_revenue": (
            "SELECT p.p_brand, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, count(*) AS n_items "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "GROUP BY p.p_brand ORDER BY p.p_brand"),
        "lineitem_corr": (
            "WITH s AS (SELECT count(*) AS n, sum(q) AS sx, sum(p) AS sy, "
            "sum(q * q) AS sxx, sum(p * p) AS syy, sum(q * p) AS sxy "
            "FROM (SELECT CAST(l_quantity AS BIGINT) AS q, "
            "CAST(round(l_extendedprice) AS BIGINT) AS p FROM lineitem)) "
            "SELECT n, round((CAST(n AS DOUBLE) * sxy - "
            "CAST(sx AS DOUBLE) * sy) / sqrt((CAST(n AS DOUBLE) * sxx - "
            "CAST(sx AS DOUBLE) * sx) * (CAST(n AS DOUBLE) * syy - "
            "CAST(sy AS DOUBLE) * sy)), 6) AS corr_qp FROM s"),
        "label_centroids": (
            "SELECT CAST(label AS BIGINT) AS label, "
            "CAST(pos AS BIGINT) AS dim, "
            "CAST(sum(CAST(round(CAST(val AS DOUBLE) * 1000000) "
            "AS BIGINT)) AS BIGINT) AS sum_micro, count(*) AS n_vals "
            "FROM (SELECT label, unnest(embedding) AS val, "
            "unnest(range(1, len(embedding) + 1)) AS pos FROM embeddings) "
            "GROUP BY label, pos ORDER BY label, dim"),
        "tfidf_terms": (
            "WITH words AS (SELECT doc_id, "
            "unnest(regexp_extract_all(lower(text), '\\S+')) AS word "
            "FROM documents), "
            "agg AS (SELECT word AS term, CAST(count(*) AS BIGINT) AS tf, "
            "CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM words "
            "WHERE word != '' GROUP BY word), "
            "n AS (SELECT count(*) AS n_docs FROM documents) "
            "SELECT CAST(row_number() OVER (ORDER BY score DESC, term) "
            "AS BIGINT) AS rnk, term, tf, df, score FROM ("
            "SELECT term, tf, df, round(CAST(tf AS DOUBLE) * "
            "ln(CAST(n.n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) "
            "AS score FROM agg, n) ORDER BY rnk LIMIT 50"),
        "collocations": r"""
            WITH toks AS (
              SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            uni AS (SELECT unnest(ws) AS w FROM toks),
            ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
            tu AS (SELECT CAST(count(*) AS DOUBLE) AS nu FROM uni),
            big AS (
              SELECT unnest([ws[i] || ' ' || ws[i+1]
                             for i in range(1, greatest(len(ws), 1))]) AS b
              FROM toks),
            bcnt AS (SELECT b, count(*) AS c FROM big GROUP BY b
                     HAVING count(*) >= 5),
            tb AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM big)
            SELECT split_part(b, ' ', 1) AS w1,
                   split_part(b, ' ', 2) AS w2,
                   CAST(bcnt.c AS BIGINT) AS c_ab,
                   round(ln((bcnt.c / tb.nb) /
                            ((ua.c / tu.nu) * (ub.c / tu.nu))), 6) AS pmi
            FROM bcnt CROSS JOIN tb CROSS JOIN tu
            JOIN ucnt ua ON ua.w = split_part(bcnt.b, ' ', 1)
            JOIN ucnt ub ON ub.w = split_part(bcnt.b, ' ', 2)
            ORDER BY pmi DESC, w1, w2 LIMIT 100""",
        "customer_order_counts": (
            "SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) "
            "AS n_orders FROM customer c LEFT JOIN orders o "
            "ON o.o_custkey = c.c_custkey GROUP BY c.c_custkey "
            "ORDER BY c.c_custkey"),
        "last_event_per_user": (
            "SELECT user_id, event_id AS last_event FROM ("
            "SELECT user_id, event_id, row_number() OVER ("
            "PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn "
            "FROM events) WHERE rn = 1 ORDER BY user_id"),
        "supplier_nation": (
            "SELECT n.n_name, count(*) AS n_suppliers FROM supplier s "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "GROUP BY n.n_name ORDER BY n.n_name"),
        "lineitem_revenue": (
            "SELECT l_returnflag, CAST(sum("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, count(*) AS n_rows FROM lineitem "
            "GROUP BY l_returnflag ORDER BY l_returnflag"),
        "lang_stats": (
            "SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars, "
            "count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang"),
        "top_docs": (
            "SELECT doc_id, n_chars FROM documents "
            "ORDER BY n_chars DESC, doc_id LIMIT 100"),
        "long_docs": (
            "SELECT doc_id, lang, n_chars FROM documents "
            "WHERE n_chars >= 400 ORDER BY doc_id"),
        "source_stats": (
            "SELECT source, count(*) AS n_docs, min(n_chars) AS min_chars, "
            "max(n_chars) AS max_chars FROM documents GROUP BY source "
            "ORDER BY source"),
        "events_by_type": (
            "SELECT event_type, count(*) AS n_events, "
            "min(user_id) AS min_user, max(user_id) AS max_user "
            "FROM events GROUP BY event_type ORDER BY event_type"),
        "lineitem_pricing": (
            "SELECT l_returnflag, l_linestatus, "
            "sum(l_quantity) AS sum_qty, count(*) AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"),
        "event_props": (
            "SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 "
            "AS k_bucket, count(*) AS n_events FROM events "
            "GROUP BY 1 ORDER BY 1"),
        "page_rank": _page_rank_sql(),
        "source_mixture": (
            "WITH d AS (SELECT doc_id, source, "
            "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
            "AS UBIGINT) % 100 AS b, "
            "(CASE source WHEN 'src0' THEN 250 WHEN 'src1' THEN 130 "
            "WHEN 'src2' THEN 60 WHEN 'src3' THEN 0 ELSE 100 END) AS r "
            "FROM documents), "
            "n AS (SELECT doc_id, source, "
            "r // 100 + CASE WHEN b < r % 100 THEN 1 ELSE 0 END AS copies "
            "FROM d) "
            "SELECT doc_id, source, CAST(unnest(generate_series(0, "
            "CAST(copies AS BIGINT) - 1)) AS BIGINT) AS copy "
            "FROM n WHERE copies > 0 ORDER BY doc_id, copy"),
        "events_hourly": (
            "SELECT event_type, "
            "CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket, "
            "count(*) AS n_events FROM events GROUP BY 1, 2"),
        "events_by_segment": (
            "SELECT c.c_mktsegment, count(*) AS n_events FROM events e "
            "JOIN customer c ON e.user_id = c.c_custkey "
            "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"),
        "user_sessions": (
            "WITH o AS (SELECT user_id, ts, "
            "lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS pts "
            "FROM events) SELECT user_id, "
            "CAST(1 + sum(CASE WHEN pts IS NOT NULL AND "
            "epoch(ts) - epoch(pts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_sessions "
            "FROM o GROUP BY user_id ORDER BY user_id"),
        "orders_by_segment": (
            "SELECT c.c_mktsegment, count(*) AS n_orders FROM orders o "
            "JOIN customer c ON o.o_custkey = c.c_custkey "
            "GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"),
        "distinct_users": (
            "SELECT event_type, count(DISTINCT user_id) AS n_users "
            "FROM events GROUP BY event_type ORDER BY event_type"),
        "views_before_click": (
            "SELECT a.event_id AS click_id, "
            "CAST(count(b.event_id) AS BIGINT) AS n_prior_views "
            "FROM events a JOIN events b ON a.user_id = b.user_id "
            "AND b.event_type = 'view' "
            "AND b.ts >= a.ts - INTERVAL 24 HOUR AND b.ts < a.ts "
            "WHERE a.event_type = 'click' GROUP BY a.event_id "
            "ORDER BY click_id"),
        "asof_join": (
            "WITH a AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'click'), "
            "b AS (SELECT user_id, ts, event_id FROM events "
            "WHERE event_type = 'view') "
            "SELECT a.event_id AS click_id, b.event_id AS view_id "
            "FROM a ASOF JOIN b ON a.user_id = b.user_id AND a.ts >= b.ts "
            "ORDER BY click_id"),
        "ann_filtered": (
            f"WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            f"FROM embeddings ORDER BY vec_id LIMIT {_ANN_NQ}), "
            "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.qe, e.embedding) AS score "
            "FROM q CROSS JOIN embeddings e WHERE e.label < 5), "
            "ranked AS (SELECT query_id, neighbor_id, row_number() OVER ("
            "PARTITION BY query_id ORDER BY score DESC, neighbor_id) "
            f"AS rank FROM scored) SELECT query_id, neighbor_id, rank "
            f"FROM ranked WHERE rank <= {_ANN_K}"),
        "ann_topk": (
            f"WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
            f"FROM embeddings ORDER BY vec_id LIMIT {_ANN_NQ}), "
            "scored AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(q.qe, e.embedding) AS score "
            "FROM q CROSS JOIN embeddings e), "
            "ranked AS (SELECT query_id, neighbor_id, row_number() OVER ("
            "PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank "
            f"FROM scored) SELECT query_id, neighbor_id, rank FROM ranked "
            f"WHERE rank <= {_ANN_K}"),
        "dup_passages": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            df AS (SELECT ng, count(*) AS c FROM ngrams GROUP BY ng),
            per AS (
              SELECT n.doc_id, count(*) AS n_ngrams,
                     CAST(sum(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_dup
              FROM ngrams n JOIN df USING (ng) GROUP BY n.doc_id)
            SELECT doc_id, n_ngrams, n_dup,
                   round(n_dup * 1.0 / n_ngrams, 6) AS dup_ratio
            FROM per ORDER BY doc_id""",
        "eval_overlap": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            ev AS (SELECT * FROM ngrams WHERE doc_id % 10 = 0),
            tr AS (SELECT DISTINCT ng FROM ngrams WHERE doc_id % 10 <> 0),
            hits AS (
              SELECT e.doc_id, count(*) AS n_ngrams,
                     CAST(sum(CASE WHEN t.ng IS NOT NULL THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_overlap
              FROM ev e LEFT JOIN tr t USING (ng) GROUP BY e.doc_id)
            SELECT doc_id, n_ngrams, n_overlap,
                   round(n_overlap * 1.0 / n_ngrams, 6) AS overlap_ratio
            FROM hits ORDER BY doc_id""",
        "word_entropy": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            w AS (SELECT doc_id, unnest(ws) AS word FROM toks),
            c AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY 1, 2),
            agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                           count(*) AS n_distinct, sum(c * log2(c)) AS s
                    FROM c GROUP BY doc_id)
            SELECT doc_id, n_words, n_distinct,
                   round(log2(n_words) - s / n_words, 4) AS word_entropy,
                   round(n_distinct * 1.0 / n_words, 6) AS ttr
            FROM agg ORDER BY doc_id""",
        "big_orders": r"""
            WITH qty AS (
              SELECT l_orderkey,
                     CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                       AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 200)
            SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
                   q.total_qty, c.c_name
            FROM qty q
            JOIN orders o ON o.o_orderkey = q.l_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_orderkey""",
        "semantic_dedup": (
            "SELECT * FROM read_parquet("
            f"'{_fixture('sf0_01/semantic_dedup.parquet')}')"),
        "chars_quantiles_approx": r"""
            WITH b AS (SELECT CAST(min(n_chars) AS BIGINT) AS lo,
                              CAST(max(n_chars) AS BIGINT) AS hi,
                              CAST(count(*) AS BIGINT) AS n
                       FROM documents),
            h AS (SELECT ((d.n_chars - b.lo) * 1024)
                           // (b.hi - b.lo + 1) AS bucket,
                         CAST(count(*) AS BIGINT) AS c
                  FROM documents d, b GROUP BY 1),
            cum AS (SELECT bucket,
                           sum(c) OVER (ORDER BY bucket) AS cm FROM h),
            qq AS (SELECT unnest([50, 90, 99]) AS q),
            pick AS (SELECT qq.q AS q, min(cum.bucket) AS bucket
                     FROM qq, b, cum
                     WHERE cum.cm >= greatest(1, (qq.q * b.n + 99) // 100)
                     GROUP BY qq.q)
            SELECT CAST(p.q AS BIGINT) AS q,
                   CAST(b.lo + p.bucket * (b.hi - b.lo + 1) // 1024
                        AS BIGINT) AS est
            FROM pick p, b ORDER BY q""",
        "mode_source": r"""
            SELECT lang, source AS mode_source, n FROM (
              SELECT lang, source, CAST(count(*) AS BIGINT) AS n,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY count(*) DESC, source)
                       AS rnk
              FROM documents GROUP BY lang, source)
            WHERE rnk = 1 ORDER BY lang""",
        "bm25_topk": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            q AS (SELECT unnest(['batch', 'hash', 'scan']) AS term),
            stats AS (SELECT count(*) AS n, avg(len(ws)) AS avgdl
                      FROM toks),
            tf AS (SELECT t.doc_id, w.word AS term,
                          CAST(count(*) AS BIGINT) AS tf,
                          any_value(len(t.ws)) AS dl
                   FROM toks t, unnest(t.ws) AS w(word)
                   WHERE w.word IN (SELECT term FROM q)
                   GROUP BY t.doc_id, w.word),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     -- constants written as the engine computes them
                     -- ((k1+1.0) != literal 2.2 at the last ulp)
                     sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1.0))
                         / (tf.tf + 1.2 * (1.0 - 0.75
                                           + 0.75 * tf.dl / s.avgdl)))
                       AS raw
              FROM tf JOIN df USING (term), stats s
              GROUP BY tf.doc_id)
            SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score
            FROM scored
            ORDER BY score DESC, doc_id LIMIT 20""",
        "daily_revenue_ma7": r"""
            WITH d AS (
              SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT)
                       AS day,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS rev_c
              FROM orders GROUP BY 1),
            w AS (
              SELECT day, rev_c,
                     CAST(sum(rev_c) OVER (ORDER BY day ROWS 6 PRECEDING)
                          AS BIGINT) AS s,
                     CAST(count(*) OVER (ORDER BY day ROWS 6 PRECEDING)
                          AS BIGINT) AS c
              FROM d)
            SELECT day, rev_c, (2 * s + c) // (2 * c) AS ma7_c
            FROM w ORDER BY day""",
        "item_triangles": r"""
            WITH ui AS (
              SELECT DISTINCT user_id,
                     CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1)
                          AS BIGINT) AS item
              FROM events WHERE event_type = 'view'),
            e0 AS (SELECT a.item AS a, b.item AS b, count(*) AS n
                   FROM ui a JOIN ui b
                     ON a.user_id = b.user_id AND a.item < b.item
                   GROUP BY 1, 2),
            e AS (SELECT a, b FROM e0 WHERE n >= 2),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                    FROM e e1
                    JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                    JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
            items AS (SELECT x AS item FROM tri
                      UNION ALL SELECT y FROM tri
                      UNION ALL SELECT z FROM tri)
            SELECT item, CAST(count(*) AS BIGINT) AS n_triangles
            FROM items GROUP BY item ORDER BY item""",
        "weighted_sample": r"""
            WITH keyed AS (
              SELECT doc_id, n_chars AS weight,
                     ln((CAST(concat('0x', substr(md5(concat('aes-1:',
                           CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT)
                         + 1.0) / 1152921504606846976.0)
                       / n_chars AS r
              FROM documents WHERE n_chars > 0),
            top AS (SELECT * FROM keyed
                    ORDER BY r DESC, doc_id LIMIT 100)
            SELECT doc_id, weight, round(r, 6) AS aes_key
            FROM top ORDER BY doc_id""",
        "lang_chars_quantiles": r"""
            WITH b AS (SELECT CAST(min(n_chars) AS BIGINT) AS lo,
                              CAST(max(n_chars) AS BIGINT) AS hi
                       FROM documents),
            h AS (SELECT d.lang AS key,
                         ((d.n_chars - b.lo) * 1024)
                           // (b.hi - b.lo + 1) AS bucket,
                         CAST(count(*) AS BIGINT) AS c
                  FROM documents d, b GROUP BY 1, 2),
            cum AS (SELECT key, bucket,
                           sum(c) OVER (PARTITION BY key
                                        ORDER BY bucket) AS cm,
                           sum(c) OVER (PARTITION BY key) AS n
                    FROM h),
            qq AS (SELECT unnest([50, 90]) AS q),
            pick AS (SELECT cum.key, qq.q, min(cum.bucket) AS bucket
                     FROM qq JOIN cum
                       ON cum.cm >= greatest(1, (qq.q * cum.n + 99) // 100)
                     GROUP BY 1, 2)
            SELECT p.key AS lang, CAST(p.q AS BIGINT) AS q,
                   CAST(b.lo + p.bucket * (b.hi - b.lo + 1) // 1024
                        AS BIGINT) AS est
            FROM pick p, b ORDER BY lang, q""",
        "lm_scores": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            tr AS (SELECT * FROM toks WHERE doc_id % 10 <> 0),
            ev AS (SELECT * FROM toks WHERE doc_id % 10 = 0),
            uni AS (SELECT w AS word, CAST(count(*) AS BIGINT) AS c1
                    FROM (SELECT unnest(ws) AS w FROM tr) GROUP BY 1),
            v AS (SELECT count(*) AS v FROM uni),
            bi_tr AS (
              SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM (
                SELECT unnest([ws[i] || ' ' || ws[i+1]
                               for i in range(1, greatest(len(ws), 1))])
                       AS bg
                FROM tr) GROUP BY 1),
            ev_bi AS (
              SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS tf FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1]
                               for i in range(1, greatest(len(ws), 1))])
                       AS bg
                FROM ev) GROUP BY 1, 2),
            scored AS (
              SELECT e.doc_id,
                     sum(e.tf * ln((COALESCE(b.c2, 0) + 1.0)
                                   / (COALESCE(u.c1, 0) + v.v))) AS s,
                     CAST(sum(e.tf) AS BIGINT) AS n
              FROM ev_bi e
              CROSS JOIN v
              LEFT JOIN bi_tr b ON b.bg = e.bg
              LEFT JOIN uni u ON u.word = split_part(e.bg, ' ', 1)
              GROUP BY e.doc_id)
            SELECT doc_id, n AS n_bigrams,
                   floor((-s / n) * 1e4 + 0.5) / 1e4 AS nll
            FROM scored ORDER BY doc_id""",
        "lang_source_pmi": r"""
            WITH cells AS (SELECT lang, source,
                                  CAST(count(*) AS BIGINT) AS n
                           FROM documents GROUP BY 1, 2),
            l AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl
                  FROM cells GROUP BY 1),
            s AS (SELECT source, CAST(sum(n) AS BIGINT) AS ns
                  FROM cells GROUP BY 1),
            t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM cells)
            SELECT c.lang, c.source, c.n,
                   round(ln((c.n * t.nt) / (1.0 * l.nl * s.ns)), 6) AS pmi
            FROM cells c
            JOIN l USING (lang) JOIN s USING (source) CROSS JOIN t
            ORDER BY c.lang, c.source""",
        "intra_dup_ngrams": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ng AS (
              SELECT doc_id, ng, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks) GROUP BY 1, 2),
            per AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_ngrams,
                           CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END)
                                AS BIGINT) AS n_dup_occ
                    FROM ng GROUP BY doc_id)
            SELECT doc_id, n_ngrams, n_dup_occ,
                   floor(n_dup_occ * 1.0 / n_ngrams * 1e6 + 0.5) / 1e6
                     AS intra_dup_ratio
            FROM per ORDER BY doc_id""",
        "dedup_keep_best": r"""
            WITH corpus AS (
              SELECT doc_id, text, source FROM documents
              UNION ALL
              SELECT doc_id + 1000000, text,
                     'src' || CAST((doc_id * 7 + 3) % 25 AS VARCHAR)
              FROM documents WHERE doc_id % 5 = 0)
            SELECT md5(text) AS text_hash, doc_id, priority, n_dups
            FROM (
              SELECT doc_id, text, priority,
                row_number() OVER (PARTITION BY md5(text)
                                   ORDER BY priority, doc_id) AS rn,
                count(*) OVER (PARTITION BY md5(text)) AS n_dups
              FROM (SELECT doc_id, text,
                           CAST(substr(source, 4) AS BIGINT) AS priority
                    FROM corpus))
            WHERE rn = 1 ORDER BY doc_id""",
        "quality_classifier": r"""
            SELECT doc_id, CAST(score AS BIGINT) AS score,
                   CAST(score >= 0 AS BIGINT) AS label FROM (
              SELECT doc_id,
                SUM(CAST(CAST(concat('0x', substr(md5(word), 1, 8))
                              AS UBIGINT) % 2001 AS BIGINT) - 1000)
                  AS score
              FROM (SELECT doc_id,
                           unnest(regexp_extract_all(lower(text), '\S+'))
                             AS word
                    FROM documents)
              GROUP BY doc_id) ORDER BY doc_id""",
        "winnow_fingerprints": r"""
            WITH grams AS (
              SELECT doc_id,
                list_transform(range(1, len(lst) - 1),
                  i -> CAST(concat('0x', substr(md5(
                         lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2]),
                         1, 8)) AS UBIGINT)) AS h
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '\S+') AS lst
                    FROM documents)
              WHERE len(lst) >= 3),
            mins AS (
              SELECT doc_id,
                CASE WHEN len(h) <= 4 THEN [list_min(h)]
                     ELSE list_transform(range(1, len(h) - 2),
                                         j -> list_min(h[j:j+3])) END
                  AS wmins
              FROM grams)
            SELECT doc_id, CAST(fp AS BIGINT) AS fp
            FROM (SELECT doc_id, unnest(list_distinct(wmins)) AS fp
                  FROM mins)
            ORDER BY doc_id, fp""",
        "table_profile": r"""
            SELECT 'event_type' AS "column", count(*) AS n_rows,
                   count(*) - count(event_type) AS n_nulls,
                   count(DISTINCT event_type) AS n_distinct FROM events
            UNION ALL
            SELECT 'props', count(*), count(*) - count(props),
                   count(DISTINCT props) FROM events
            UNION ALL
            SELECT 'user_id', count(*), count(*) - count(user_id),
                   count(DISTINCT user_id) FROM events
            ORDER BY 1""",
        "value_outliers": r"""
            WITH m AS (
              SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
              FROM events
              WHERE value IS NOT NULL AND event_type IS NOT NULL),
            s AS (
              SELECT event_type, count(*) AS n, sum(v) AS sv,
                     sum(v * v) AS svv
              FROM m GROUP BY event_type)
            SELECT m.event_type, CAST(count(*) FILTER (
              WHERE abs(m.v - sv * 1.0 / n) > 2.0 * sqrt(greatest(
                svv * 1.0 / n - (sv * 1.0 / n) * (sv * 1.0 / n), 0.0))
            ) AS BIGINT) AS n_outliers, CAST(max(n) AS BIGINT) AS n
            FROM m JOIN s USING (event_type)
            GROUP BY m.event_type ORDER BY m.event_type""",
        "spearman_qty_price": r"""
            WITH v AS (
              SELECT CAST(round(l_quantity * 100) AS BIGINT) AS a,
                     CAST(round(l_extendedprice * 100) AS BIGINT) AS b
              FROM lineitem),
            r AS (
              SELECT
                2 * rank() OVER (ORDER BY a)
                  + count(*) OVER (PARTITION BY a) - 1 AS ra,
                2 * rank() OVER (ORDER BY b)
                  + count(*) OVER (PARTITION BY b) - 1 AS rb
              FROM v),
            s AS (
              SELECT count(*) AS n, sum(ra) AS sa, sum(rb) AS sb,
                     sum(ra * ra) AS saa, sum(rb * rb) AS sbb,
                     sum(ra * rb) AS sab
              FROM r)
            SELECT floor(CAST(n * sab - sa * sb AS DOUBLE) /
                   sqrt(CAST(n * saa - sa * sa AS DOUBLE)
                        * CAST(n * sbb - sb * sb AS DOUBLE))
                   * 1e6 + 0.5) / 1e6 AS spearman,
                   CAST(n AS BIGINT) AS n
            FROM s""",
        "mad_outliers": r"""
            WITH v AS (
              SELECT event_type AS k,
                     CAST(round(value * 100) AS BIGINT) AS v
              FROM events WHERE value IS NOT NULL),
            m AS (
              SELECT k, count(*) AS n,
                     CAST(round(2 * quantile_cont(CAST(v AS DOUBLE), 0.5))
                          AS BIGINT) AS m2
              FROM v GROUP BY k),
            d AS (
              SELECT v.k, abs(2 * v.v - m.m2) AS d
              FROM v JOIN m USING (k)),
            md AS (
              SELECT k,
                     CAST(round(2 * quantile_cont(CAST(d AS DOUBLE), 0.5))
                          AS BIGINT) AS m4
              FROM d GROUP BY k),
            o AS (
              SELECT d.k,
                     sum(CASE WHEN 2 * d.d > 5 * md.m4
                         THEN 1 ELSE 0 END) AS n_out
              FROM d JOIN md USING (k) GROUP BY d.k)
            SELECT m.k AS event_type, CAST(m.n AS BIGINT) AS n,
                   CAST(m.m2 AS DOUBLE) / 2 / 100 AS median,
                   CAST(md.m4 AS DOUBLE) / 4 / 100 AS mad,
                   CAST(o.n_out AS BIGINT) AS n_outliers
            FROM m JOIN md USING (k) JOIN o USING (k)
            ORDER BY event_type""",
        "source_drift_kl": r"""
            WITH toks AS (
              SELECT source,
                     unnest(regexp_extract_all(lower(text), '\S+')) AS term
              FROM documents),
            vocab AS (
              SELECT term, count(*) AS ct
              FROM toks GROUP BY term
              ORDER BY ct DESC, term LIMIT 200),
            vt AS (SELECT sum(ct) AS nv FROM vocab),
            st AS (
              SELECT t.source, t.term, count(*) AS cst
              FROM toks t JOIN vocab v USING (term)
              GROUP BY t.source, t.term),
            ns AS (SELECT source, sum(cst) AS nsv FROM st GROUP BY source),
            contrib AS (
              SELECT st.source,
                     (st.cst / ns.nsv)
                       * ln((st.cst * vt.nv) / (ns.nsv * v.ct)) AS x
              FROM st JOIN ns USING (source)
                   JOIN vocab v ON st.term = v.term CROSS JOIN vt)
            SELECT c.source, CAST(ns.nsv AS BIGINT) AS n,
                   CAST(sum(CAST(sign(x) * floor(abs(x) * 1e9 + 0.5)
                                 AS BIGINT)) AS DOUBLE) / 1e9 AS kl
            FROM contrib c JOIN ns ON c.source = ns.source
            GROUP BY c.source, ns.nsv ORDER BY c.source""",
        "value_trend": r"""
            WITH v AS (
              SELECT event_type AS k,
                     CAST(CAST(ts AS DATE) - DATE '1970-01-01'
                          AS BIGINT) AS x,
                     CAST(round(value * 100) AS BIGINT) AS y
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
                            AND event_type IS NOT NULL),
            s AS (
              SELECT k, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(x * y) AS sxy
              FROM v GROUP BY k),
            r AS (
              SELECT k, n,
                     CAST(CAST(n AS HUGEINT) * sxy
                          - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                     / CAST(NULLIF(CAST(n AS HUGEINT) * sxx
                                   - CAST(sx AS HUGEINT) * sx, 0)
                            AS DOUBLE) AS slope_raw,
                     sx, sy
              FROM s)
            SELECT k AS event_type, CAST(n AS BIGINT) AS n,
                   sign(slope_raw) * floor(abs(slope_raw) * 1e6 + 0.5)
                     / 1e6 AS slope,
                   sign((sy - slope_raw * sx) / n)
                     * floor(abs((sy - slope_raw * sx) / n) * 1e6 + 0.5)
                     / 1e6 AS b
            FROM r ORDER BY event_type""",
        "cumulative_users": r"""
            WITH f AS (
              SELECT user_id,
                     min(CAST(floor(epoch_us(ts) / 86400000000)
                              AS BIGINT)) AS day
              FROM events GROUP BY user_id)
            SELECT day AS day_bucket,
                   CAST(count(*) AS BIGINT) AS new_users,
                   CAST(sum(count(*)) OVER (ORDER BY day)
                        AS BIGINT) AS cum_users
            FROM f GROUP BY day ORDER BY day""",
        "segment_gini": r"""
            WITH spend AS (
              SELECT c.c_mktsegment AS segment,
                     sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS v
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY c.c_mktsegment, o.o_custkey),
            g AS (
              SELECT segment, v,
                     row_number() OVER (PARTITION BY segment
                                        ORDER BY v) AS i
              FROM spend)
            SELECT segment, CAST(count(*) AS BIGINT) AS n,
                   floor(CAST(2 * sum(i * v) - (count(*) + 1) * sum(v)
                              AS DOUBLE)
                         / CAST(count(*) * sum(v) AS DOUBLE)
                         * 1e6 + 0.5) / 1e6 AS gini
            FROM g GROUP BY segment ORDER BY segment""",
        "term_cms": r"""
            WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
              FROM documents),
            cnt AS (SELECT term, count(*) AS n FROM toks GROUP BY term),
            qry AS (SELECT term FROM cnt ORDER BY n DESC, term LIMIT 30),
            rws AS (SELECT unnest([0, 1, 2, 3]) AS r),
            bkt AS (
              SELECT r, term, n,
                     CAST(concat('0x', substr(
                       md5('cms' || r || ':' || term), 1, 8))
                       AS UBIGINT) % 1024 AS b
              FROM cnt CROSS JOIN rws),
            cell AS (SELECT r, b, sum(n) AS s FROM bkt GROUP BY r, b)
            SELECT q.term AS value, CAST(min(cell.s) AS BIGINT) AS est
            FROM qry q
            JOIN bkt ON bkt.term = q.term
            JOIN cell ON cell.r = bkt.r AND cell.b = bkt.b
            GROUP BY q.term ORDER BY q.term""",
        "title_fuzzy": r"""
            WITH t AS (
              SELECT DISTINCT lower(substr(text, 1, 12)) AS title
              FROM documents WHERE text IS NOT NULL),
            d AS (SELECT title FROM t WHERE title <> '')
            SELECT a.title AS "left", b.title AS "right"
            FROM d a JOIN d b ON a.title < b.title
            WHERE levenshtein(a.title, b.title) = 1
            ORDER BY "left", "right" """,
        "dense_rank_docs": r"""
            SELECT doc_id, lang, n_chars,
                   CAST(dense_rank() OVER (PARTITION BY lang
                                           ORDER BY n_chars DESC)
                        AS BIGINT) AS dr
            FROM documents
            QUALIFY dr <= 3
            ORDER BY lang, dr, doc_id""",
        "concurrent_sessions": r"""
            WITH o AS (
              SELECT user_id, ts,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s2 AS (
              SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM o),
            sess AS (
              SELECT user_id, sid, min(epoch_us(ts)) AS st,
                     max(epoch_us(ts)) AS en
              FROM s2 GROUP BY user_id, sid),
            conc AS (
              SELECT s1.st AS t,
                     (SELECT count(*) FROM sess s2
                      WHERE s2.st <= s1.st AND s2.en >= s1.st) AS c
              FROM sess s1)
            SELECT CAST(t // 86400000000 AS BIGINT) AS day_bucket,
                   CAST(max(c) AS BIGINT) AS max_concurrent
            FROM conc GROUP BY 1 ORDER BY 1""",
        "bpe_pairs": r"""
            WITH t AS (SELECT lower(text) AS s FROM documents
                       WHERE text IS NOT NULL),
            p AS (
              SELECT substr(s, CAST(i AS INTEGER), 2) AS pair
              FROM t CROSS JOIN (
                SELECT unnest(range(1, (SELECT max(length(s)) FROM t)))
                  AS i)
              WHERE i <= length(s) - 1)
            SELECT CAST(row_number() OVER (ORDER BY count(*) DESC, pair)
                        AS BIGINT) AS rnk,
                   pair, count(*) AS n
            FROM p GROUP BY pair
            ORDER BY n DESC, pair LIMIT 50""",
        "hybrid_rrf": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            q AS (SELECT unnest(['batch', 'hash', 'scan']) AS term),
            stats AS (SELECT count(*) AS n, avg(len(ws)) AS avgdl
                      FROM toks),
            tf AS (SELECT t.doc_id, w.word AS term,
                          CAST(count(*) AS BIGINT) AS tf,
                          any_value(len(t.ws)) AS dl
                   FROM toks t, unnest(t.ws) AS w(word)
                   WHERE w.word IN (SELECT term FROM q)
                   GROUP BY t.doc_id, w.word),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1.0))
                         / (tf.tf + 1.2 * (1.0 - 0.75
                                           + 0.75 * tf.dl / s.avgdl)))
                       AS raw
              FROM tf JOIN df USING (term), stats s
              GROUP BY tf.doc_id),
            lexcut AS (
              SELECT doc_id, floor(raw * 1e6 + 0.5) / 1e6 AS score
              FROM scored ORDER BY score DESC, doc_id LIMIT 20),
            lex AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY score DESC, doc_id)
                       AS lr
              FROM lexcut),
            qd AS (SELECT embedding AS qe FROM embeddings
                   WHERE vec_id = 0),
            dsc AS (SELECT e.vec_id AS doc_id,
                           list_cosine_similarity(qd.qe, e.embedding) AS s
                    FROM qd CROSS JOIN embeddings e),
            den AS (
              SELECT doc_id,
                     row_number() OVER (ORDER BY s DESC, doc_id) AS dr
              FROM dsc QUALIFY dr <= 20),
            f AS (
              SELECT coalesce(lex.doc_id, den.doc_id) AS doc_id,
                     coalesce(CAST(floor(1e9 / (60 + lr) + 0.5)
                                   AS BIGINT), 0)
                     + coalesce(CAST(floor(1e9 / (60 + dr) + 0.5)
                                     AS BIGINT), 0) AS rrf_ppb
              FROM lex FULL OUTER JOIN den
                   ON lex.doc_id = den.doc_id)
            SELECT CAST(row_number() OVER (ORDER BY rrf_ppb DESC, doc_id)
                        AS BIGINT) AS rnk,
                   doc_id, rrf_ppb
            FROM f ORDER BY rrf_ppb DESC, doc_id LIMIT 10""",
        "weekly_churn": r"""
            WITH uw AS (
              SELECT DISTINCT user_id,
                     CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
              FROM events),
            mx AS (SELECT max(week) AS lw FROM uw),
            t AS (
              SELECT user_id, week,
                     CASE WHEN lead(week) OVER (PARTITION BY user_id
                                                ORDER BY week)
                               = week + 1
                          THEN 1 ELSE 0 END AS retained
              FROM uw)
            SELECT week, CAST(count(*) AS BIGINT) AS active,
                   CAST(sum(retained) AS BIGINT) AS retained,
                   CAST(count(*) - sum(retained) AS BIGINT) AS churned
            FROM t, mx WHERE week < mx.lw
            GROUP BY week ORDER BY week""",
        "revenue_forecast": (
            "SELECT CAST(sum("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, count(*) AS n_rows FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7 "
            "AND l_quantity < 24"),
        "promo_revenue": (
            "WITH l AS (SELECT "
            "strftime(date_trunc('month', li.l_shipdate), '%Y-%m') "
            "AS ship_month, "
            "CAST(round(li.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - li.l_discount) * 100) AS BIGINT) AS rev, "
            "CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS isp "
            "FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey) "
            "SELECT ship_month, "
            "CAST(sum(CASE WHEN isp = 1 THEN rev ELSE 0 END) AS BIGINT) "
            "AS promo_rev_c4, CAST(sum(rev) AS BIGINT) AS total_rev_c4, "
            "CAST(CAST(1000000 AS HUGEINT) * "
            "sum(CASE WHEN isp = 1 THEN rev ELSE 0 END) // sum(rev) "
            "AS BIGINT) AS promo_ppm "
            "FROM l GROUP BY 1 ORDER BY 1"),
        "customer_distribution": (
            "WITH per_cust AS (SELECT c.c_custkey, "
            "count(o.o_orderkey) AS c_count "
            "FROM customer c LEFT JOIN orders o "
            "ON c.c_custkey = o.o_custkey GROUP BY 1) "
            "SELECT c_count, count(*) AS custdist FROM per_cust "
            "GROUP BY 1 ORDER BY custdist DESC, c_count DESC"),
        "top_supplier": (
            "WITH rev AS (SELECT l_suppkey, CAST(sum("
            "CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS total_rev_c4 FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY 1) "
            "SELECT s.s_suppkey, s.s_name, r.total_rev_c4 "
            "FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey "
            "WHERE r.total_rev_c4 = (SELECT max(total_rev_c4) FROM rev) "
            "ORDER BY s.s_suppkey"),
        "idle_customer_balance": (
            "WITH bal AS (SELECT c_custkey, c_nationkey, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c "
            "FROM customer), "
            "agg AS (SELECT sum(bal_c) AS s, count(*) AS n "
            "FROM bal WHERE bal_c > 0) "
            "SELECT CAST(b.c_nationkey AS BIGINT) AS c_nationkey, "
            "CAST(sum(b.bal_c) AS BIGINT) AS total_bal_c, "
            "count(*) AS n_custs "
            "FROM bal b, agg WHERE b.bal_c * agg.n > agg.s "
            "AND NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = b.c_custkey "
            "AND o.o_orderdate >= TIMESTAMP '2000-07-01') "
            "GROUP BY 1 ORDER BY 1"),
        "nation_trade_volume": (
            "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
            "CAST(year(l.l_shipdate) AS BIGINT) AS l_year, "
            "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4 "
            "FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation n1 ON s.s_nationkey = n1.n_nationkey "
            "JOIN nation n2 ON c.c_nationkey = n2.n_nationkey "
            "JOIN region r1 ON n1.n_regionkey = r1.r_regionkey "
            "JOIN region r2 ON n2.n_regionkey = r2.r_regionkey "
            "WHERE ((r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA') "
            "OR (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')) "
            "AND l.l_shipdate >= TIMESTAMP '1996-01-01' "
            "AND l.l_shipdate < TIMESTAMP '1998-01-01' "
            "GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
        "market_share": (
            "WITH cell AS (SELECT "
            "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT) AS rev, "
            "CASE WHEN sn.n_name = 'NATION_3' THEN 1 ELSE 0 END AS isn3 "
            "FROM lineitem l "
            "JOIN part p ON l.l_partkey = p.p_partkey "
            "JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation sn ON s.s_nationkey = sn.n_nationkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation cn ON c.c_nationkey = cn.n_nationkey "
            "JOIN region r ON cn.n_regionkey = r.r_regionkey "
            "WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1998-01-01') "
            "SELECT o_year, "
            "CAST(sum(CASE WHEN isn3 = 1 THEN rev ELSE 0 END) AS BIGINT) "
            "AS n3_rev_c4, CAST(sum(rev) AS BIGINT) AS total_rev_c4, "
            "CAST(CAST(1000000 AS HUGEINT) * "
            "sum(CASE WHEN isn3 = 1 THEN rev ELSE 0 END) // sum(rev) "
            "AS BIGINT) AS mkt_share_ppm "
            "FROM cell GROUP BY 1 ORDER BY 1"),
        "returned_items": (
            "SELECT c.c_custkey, c.c_name, n.n_name, CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4 "
            "FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "WHERE l.l_returnflag = 'R' "
            "AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o.o_orderdate < TIMESTAMP '1996-07-01' "
            "GROUP BY 1, 2, 3 "
            "ORDER BY revenue_c4 DESC, c_custkey LIMIT 20"),
        "pareto_orders": (
            "WITH o AS (SELECT o_orderkey, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS price_c, "
            "CAST(date_diff('day', TIMESTAMP '1970-01-01', o_orderdate) "
            "AS BIGINT) AS o_days FROM orders) "
            "SELECT a.o_orderkey, a.price_c, a.o_days FROM o a "
            "WHERE NOT EXISTS (SELECT 1 FROM o b "
            "WHERE b.price_c >= a.price_c AND b.o_days >= a.o_days "
            "AND (b.price_c > a.price_c OR b.o_days > a.o_days)) "
            "ORDER BY a.price_c DESC, a.o_days, a.o_orderkey"),
        "item_bfs": (
            "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS c "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib FROM pairs WHERE c >= 2 "
            "UNION ALL SELECT ib, ia FROM pairs WHERE c >= 2), "
            "seed AS (SELECT min(item) AS s FROM ui), "
            "bfs(item, dist) AS (SELECT s, 0 FROM seed UNION ALL "
            "SELECT e.ib, b.dist + 1 FROM bfs b "
            "JOIN edges e ON e.ia = b.item WHERE b.dist < 4) "
            "SELECT item, CAST(min(dist) AS BIGINT) AS dist "
            "FROM bfs GROUP BY 1 ORDER BY 1"),
        "pricing_summary": (
            "WITH l AS (SELECT l_returnflag, l_linestatus, "
            "CAST(l_quantity AS BIGINT) AS qty, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS base_c, "
            "CAST(round(l_discount * 100) AS BIGINT) AS disc_pct, "
            "CAST(round(l_tax * 100) AS BIGINT) AS tax_pct "
            "FROM lineitem) "
            "SELECT l_returnflag, l_linestatus, "
            "CAST(sum(qty) AS BIGINT) AS sum_qty, "
            "CAST(sum(base_c) AS BIGINT) AS sum_base_c, "
            "CAST(sum(base_c * (100 - disc_pct)) AS BIGINT) "
            "AS sum_disc_c4, "
            "CAST(sum(base_c * (100 - disc_pct) * (100 + tax_pct)) "
            "AS BIGINT) AS sum_charge_c6, "
            "CAST(sum(qty) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
            "AS avg_qty, "
            "CAST(sum(base_c) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
            "AS avg_price_c, "
            "CAST(sum(disc_pct) AS DOUBLE) / CAST(count(*) AS DOUBLE) "
            "AS avg_disc_pct, count(*) AS n_rows "
            "FROM l GROUP BY 1, 2 ORDER BY 1, 2"),
        "readability": (
            "WITH d AS (SELECT lang, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w, "
            "CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) "
            "AS l, greatest(CAST(len(regexp_extract_all(text, '[.!?]')) "
            "AS BIGINT), 1) AS s FROM documents), "
            "m AS (SELECT lang, "
            "(2 * l * 100000000 + w) // (2 * w) AS lw, "
            "(2 * s * 100000000 + w) // (2 * w) AS sw "
            "FROM d WHERE w > 0) "
            "SELECT lang, count(*) AS n_docs, "
            "round(0.0588 * (CAST(sum(lw) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE) / 1000000.0) "
            "- 0.296 * (CAST(sum(sw) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE) / 1000000.0) - 15.8, 6) "
            "AS mean_cli FROM m GROUP BY 1 ORDER BY 1"),
        "weighted_median": (
            "WITH h AS (SELECT l_returnflag, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS v, "
            "CAST(l_quantity AS BIGINT) AS wt FROM lineitem), "
            "c AS (SELECT l_returnflag, v, sum(wt) AS w "
            "FROM h GROUP BY 1, 2), "
            "s AS (SELECT l_returnflag, v, "
            "sum(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw, "
            "sum(w) OVER (PARTITION BY l_returnflag) AS tot FROM c) "
            "SELECT l_returnflag, CAST(min(v) AS BIGINT) "
            "AS wmedian_price_c FROM s WHERE 2 * cw >= tot "
            "GROUP BY 1 ORDER BY 1"),
        "conversion_lag": (
            "WITH x AS (SELECT user_id, epoch_us(ts) AS ts_us, "
            "event_type, max(CASE WHEN event_type = 'view' "
            "THEN epoch_us(ts) END) OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv "
            "FROM events), "
            "l AS (SELECT ts_us - pv AS lag_us FROM x "
            "WHERE event_type = 'purchase' AND pv IS NOT NULL) "
            "SELECT quantile_cont(lag_us, 0.5) AS p50_lag_us, "
            "quantile_cont(lag_us, 0.95) AS p95_lag_us FROM l"),
        "source_ks": (
            "WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS v, "
            "CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), "
            "pts AS (SELECT DISTINCT v FROM h), "
            "grid AS (SELECT t.source, pts.v FROM "
            "(SELECT DISTINCT source FROM h) t CROSS JOIN pts), "
            "j AS (SELECT grid.source, grid.v, coalesce(h.c, 0) AS c "
            "FROM grid LEFT JOIN h ON h.source = grid.source "
            "AND h.v = grid.v), "
            "s AS (SELECT source, v, "
            "sum(c) OVER (PARTITION BY source ORDER BY v) AS cs, "
            "sum(c) OVER (PARTITION BY source) AS ns FROM j), "
            "gt AS (SELECT v, sum(c) AS cv FROM h GROUP BY 1), "
            "gc AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cg, "
            "sum(cv) OVER () AS ng FROM gt) "
            "SELECT s.source, CAST(max(s.ns) AS BIGINT) AS n_docs, "
            "CAST(CAST(1000000 AS HUGEINT) * "
            "max(abs(s.cs * gc.ng - gc.cg * s.ns)) "
            "// (max(s.ns) * max(gc.ng)) AS BIGINT) AS ks_ppm "
            "FROM s JOIN gc USING (v) GROUP BY 1 ORDER BY 1"),
        "event_transitions": (
            "WITH s AS (SELECT user_id, event_type, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nxt FROM events) "
            "SELECT event_type AS prev_type, nxt AS next_type, "
            "count(*) AS n FROM s WHERE nxt IS NOT NULL "
            "GROUP BY 1, 2 ORDER BY 1, 2"),
        "rfm_segments": (
            "WITH pc AS (SELECT o_custkey, "
            "CAST(date_diff('day', TIMESTAMP '1970-01-01', "
            "max(o_orderdate)) AS BIGINT) AS rd, "
            "count(*) AS f, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS m FROM orders GROUP BY 1), "
            "cuts AS (SELECT quantile_cont(rd, 0.5) AS cr, "
            "quantile_cont(f, 0.5) AS cf, quantile_cont(m, 0.5) AS cm "
            "FROM pc) "
            "SELECT CASE WHEN rd <= cr THEN 1 ELSE 2 END AS r_b, "
            "CASE WHEN f <= cf THEN 1 ELSE 2 END AS f_b, "
            "CASE WHEN m <= cm THEN 1 ELSE 2 END AS m_b, "
            "count(*) AS n_customers "
            "FROM pc, cuts GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"),
        "classifier_auc": (
            "WITH h AS (SELECT CAST(n_chars AS BIGINT) AS v, "
            "CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS pos, "
            "CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) "
            "AS BIGINT) AS neg FROM documents GROUP BY 1), "
            "s AS (SELECT v, pos, neg, "
            "coalesce(sum(neg) OVER (ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS neg_below FROM h), "
            "t AS (SELECT sum(2 * neg_below * pos + neg * pos) AS u2, "
            "sum(pos) AS np, sum(neg) AS nn FROM s) "
            "SELECT CAST(np AS BIGINT) AS n_pos, "
            "CAST(nn AS BIGINT) AS n_neg, "
            "CAST(CAST(1000000 AS HUGEINT) * u2 // (2 * np * nn) "
            "AS BIGINT) AS auc_ppm FROM t"),
        "benford_digits": (
            "WITH d AS (SELECT CAST(substr(CAST("
            "CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), "
            "1, 1) AS BIGINT) AS digit FROM orders), "
            "c AS (SELECT digit, count(*) AS n_orders FROM d "
            "GROUP BY 1), t AS (SELECT sum(n_orders) AS nt FROM c) "
            "SELECT digit, CAST(n_orders AS BIGINT) AS n_orders, "
            "floor(nt * log10(1.0 + 1.0 / digit) * 1000000 + 0.5) "
            "/ 1000000.0 AS expected, "
            "floor((n_orders - nt * log10(1.0 + 1.0 / digit)) * "
            "(n_orders - nt * log10(1.0 + 1.0 / digit)) / "
            "(nt * log10(1.0 + 1.0 / digit)) * 1000000 + 0.5) "
            "/ 1000000.0 AS chi2_term "
            "FROM c, t ORDER BY digit"),
        "stickiness": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, "
            "strftime(date_trunc('month', ts), '%Y-%m') AS month "
            "FROM events), "
            "dau AS (SELECT month, count(*) AS user_days, "
            "count(DISTINCT day) AS n_days FROM ud GROUP BY 1), "
            "mau AS (SELECT strftime(date_trunc('month', ts), '%Y-%m') "
            "AS month, count(DISTINCT user_id) AS mau "
            "FROM events GROUP BY 1) "
            "SELECT d.month, CAST(d.user_days AS BIGINT) AS user_days, "
            "CAST(d.n_days AS BIGINT) AS n_days, "
            "CAST(m.mau AS BIGINT) AS mau, "
            "CAST(CAST(1000000 AS HUGEINT) * d.user_days "
            "// (d.n_days * m.mau) AS BIGINT) AS stickiness_ppm "
            "FROM dau d JOIN mau m USING (month) ORDER BY 1"),
        "revenue_autocorr": (
            "WITH d AS (SELECT "
            "CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) "
            "AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rev FROM orders GROUP BY 1), "
            "p AS (SELECT a.rev AS x, b.rev AS y FROM d a "
            "JOIN d b ON b.day = a.day + 1), "
            "s AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx, "
            "sum(CAST(y AS HUGEINT)) AS sy, "
            "sum(CAST(x AS HUGEINT) * x) AS sxx, "
            "sum(CAST(y AS HUGEINT) * y) AS syy, "
            "sum(CAST(x AS HUGEINT) * y) AS sxy FROM p) "
            "SELECT CAST(n AS BIGINT) AS n_pairs, "
            "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
            "sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
            "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * "
            "(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
            "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) "
            "AS autocorr FROM s"),
        "lang_source_chi2": (
            "WITH c AS (SELECT lang, source, "
            "CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1, 2), "
            "lt AS (SELECT lang, sum(n) AS ln FROM c GROUP BY 1), "
            "st AS (SELECT source, sum(n) AS sn FROM c GROUP BY 1), "
            "t AS (SELECT sum(n) AS nt FROM c), "
            "grid AS (SELECT l.lang, s.source, l.ln, s.sn "
            "FROM lt l CROSS JOIN st s), "
            "g AS (SELECT grid.lang, grid.source, "
            "coalesce(c.n, 0) AS obs, grid.ln, grid.sn "
            "FROM grid LEFT JOIN c ON c.lang = grid.lang "
            "AND c.source = grid.source), "
            "terms AS (SELECT CAST(floor((obs - ln * sn / nt.nt) * "
            "(obs - ln * sn / nt.nt) / (ln * sn / nt.nt) "
            "* 1000000 + 0.5) AS BIGINT) AS ti, nt.nt AS nt "
            "FROM g, t nt) "
            "SELECT CAST(max(nt) AS BIGINT) AS n_docs, "
            "(SELECT count(*) FROM lt) AS n_langs, "
            "(SELECT count(*) FROM st) AS n_sources, "
            "(SELECT (count(*) - 1) FROM lt) * "
            "(SELECT (count(*) - 1) FROM st) AS dof, "
            "sum(ti) / 1000000.0 AS chi2 FROM terms"),
        "small_qty_revenue": (
            "WITH avgq AS (SELECT l_partkey, "
            "0.2 * (CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / "
            "CAST(count(*) AS DOUBLE)) AS thr "
            "FROM lineitem GROUP BY 1), "
            "f AS (SELECT l.l_extendedprice FROM lineitem l "
            "JOIN avgq a ON l.l_partkey = a.l_partkey "
            "WHERE l.l_quantity < a.thr) "
            "SELECT count(*) AS n_rows, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_c, "
            "floor(CAST(sum(CAST(round(l_extendedprice * 100) "
            "AS BIGINT)) AS DOUBLE) / 7.0 * 1000000 + 0.5) / 1000000.0 "
            "AS avg_yearly_c FROM f"),
        "brand_band_revenue": (
            "SELECT CAST(sum("
            "CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS revenue_c4, count(*) AS n_rows "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 "
            "AND l.l_quantity BETWEEN 1 AND 11) "
            "OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25 "
            "AND l.l_quantity BETWEEN 10 AND 20) "
            "OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 50 "
            "AND l.l_quantity BETWEEN 20 AND 30)"),
        "item_neighbors": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS c "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item GROUP BY 1, 2), "
            "d AS (SELECT ia AS item, ib AS nbr, c FROM pairs "
            "UNION ALL SELECT ib, ia, c FROM pairs), "
            "r AS (SELECT item, nbr, c AS n_users, row_number() OVER "
            "(PARTITION BY item ORDER BY c DESC, nbr) AS rnk FROM d) "
            "SELECT item, rnk, nbr, n_users FROM r WHERE rnk <= 5 "
            "ORDER BY item, rnk"),
        "session_bounds": (
            "WITH o AS (SELECT user_id, ts, event_id, event_type, "
            "lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS pts FROM events), "
            "s AS (SELECT *, sum(CASE WHEN pts IS NULL OR "
            "epoch_us(ts) - epoch_us(pts) > 1800000000 THEN 1 ELSE 0 "
            "END) OVER (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS UNBOUNDED PRECEDING) AS sid FROM o), "
            "b AS (SELECT DISTINCT user_id, sid, "
            "first_value(event_type) OVER (PARTITION BY user_id, sid "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS entry_type, "
            "last_value(event_type) OVER (PARTITION BY user_id, sid "
            "ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING "
            "AND UNBOUNDED FOLLOWING) AS exit_type FROM s) "
            "SELECT entry_type, exit_type, count(*) AS n_sessions "
            "FROM b GROUP BY 1, 2 ORDER BY 1, 2"),
        "revenue_concentration": (
            "WITH pc2 AS (SELECT o_custkey, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS m FROM orders GROUP BY 1), "
            "cut AS (SELECT quantile_cont(m, 0.99) AS c FROM pc2) "
            "SELECT CAST(sum(CASE WHEN m > cut.c THEN 1 ELSE 0 END) "
            "AS BIGINT) AS top_customers, count(*) AS all_customers, "
            "CAST(CAST(1000000 AS HUGEINT) * "
            "sum(CASE WHEN m > cut.c THEN m ELSE 0 END) // sum(m) "
            "AS BIGINT) AS top_share_ppm FROM pc2, cut"),
        "item_components": (
            "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item GROUP BY 1, 2 "
            "HAVING count(*) >= 2), "
            "edges AS (SELECT ia, ib FROM pairs "
            "UNION ALL SELECT ib, ia FROM pairs), "
            "reach(a, b) AS ("
            "SELECT item, item FROM (SELECT DISTINCT item FROM ui) "
            "UNION "
            "SELECT r.a, e.ib FROM reach r JOIN edges e ON e.ia = r.b) "
            "SELECT a AS item, CAST(min(b) AS BIGINT) AS component "
            "FROM reach GROUP BY 1 ORDER BY 1"),
        "rolling_active_users": (
            "WITH ud AS (SELECT DISTINCT user_id, "
            "CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day "
            "FROM events), days AS (SELECT DISTINCT day FROM ud) "
            "SELECT d.day AS day, "
            "CAST(count(DISTINCT u.user_id) AS BIGINT) AS active_7d "
            "FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day "
            "GROUP BY 1 ORDER BY 1"),
        "dup_size_histogram": (
            "WITH g AS (SELECT md5(text) AS h, count(*) AS sz "
            "FROM documents GROUP BY 1) "
            "SELECT CAST(sz AS BIGINT) AS group_size, "
            "CAST(count(*) AS BIGINT) AS n_groups, "
            "CAST(sum(sz) AS BIGINT) AS n_docs "
            "FROM g GROUP BY 1 ORDER BY 1"),
        "fulfillment_lag": (
            "WITH ls AS (SELECT l_orderkey, "
            "max(CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT)) "
            "AS last_ship FROM lineitem GROUP BY 1), "
            "lag AS (SELECT o.o_orderpriority, ls.last_ship - "
            "CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) "
            "AS lag_days FROM ls "
            "JOIN orders o ON o.o_orderkey = ls.l_orderkey) "
            "SELECT o_orderpriority, "
            "quantile_cont(lag_days, 0.5) AS p50, "
            "quantile_cont(lag_days, 0.95) AS p95 "
            "FROM lag GROUP BY 1 ORDER BY 1"),
        "priority_late_orders": (
            "SELECT o_orderpriority, "
            "CAST(count(*) AS BIGINT) AS n_late_orders "
            "FROM orders o "
            "WHERE o.o_orderdate >= TIMESTAMP '1996-07-01' "
            "AND o.o_orderdate < TIMESTAMP '1996-10-01' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) "
            "- CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) "
            "> 60) GROUP BY 1 ORDER BY 1"),
        "slow_suppliers": (
            "WITH os AS (SELECT l_orderkey, l_suppkey, "
            "max(CAST(epoch_us(l_shipdate) // 86400000000 AS BIGINT)) "
            "AS smax FROM lineitem GROUP BY 1, 2), "
            "o AS (SELECT l_orderkey, max(smax) AS omax, "
            "count(*) AS nsupp, "
            "sum(CASE WHEN smax = (SELECT max(smax) FROM os x "
            "WHERE x.l_orderkey = os.l_orderkey) THEN 1 ELSE 0 END) "
            "AS natmax FROM os GROUP BY 1), "
            "w AS (SELECT os.l_suppkey FROM os "
            "JOIN o USING (l_orderkey) "
            "WHERE o.nsupp >= 2 AND o.natmax = 1 AND os.smax = o.omax) "
            "SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait "
            "FROM w JOIN supplier s ON s.s_suppkey = w.l_suppkey "
            "GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10"),
        "user_entropy": (
            "WITH c AS (SELECT user_id, event_type, count(*) AS c "
            "FROM events GROUP BY 1, 2), "
            "s AS (SELECT user_id, "
            "CAST(sum(CAST(floor(c * ln(c) * 1000000000 + 0.5) "
            "AS BIGINT)) AS BIGINT) AS s, "
            "CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1) "
            "SELECT user_id, n AS n_events, "
            "CAST(floor((ln(n) - s / 1000000000.0 / n) * 1000000000 "
            "+ 0.5) AS BIGINT) AS entropy_nano "
            "FROM s ORDER BY entropy_nano DESC, user_id LIMIT 20"),
        "vocab_growth": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '\\S+') AS ws "
            "FROM documents), "
            "tri AS (SELECT doc_id, ws[u.i] || ' ' || ws[u.i+1] || ' ' "
            "|| ws[u.i+2] AS term FROM toks, "
            "unnest(range(1, greatest(len(ws) - 1, 1))) u(i)), "
            "ft AS (SELECT term, min(doc_id) AS first_doc FROM tri "
            "GROUP BY 1), "
            "b AS (SELECT first_doc // 50 AS bucket, "
            "count(*) AS new_terms FROM ft GROUP BY 1) "
            "SELECT CAST(bucket AS BIGINT) AS bucket, "
            "CAST(new_terms AS BIGINT) AS new_terms, "
            "CAST(sum(new_terms) OVER (ORDER BY bucket) AS BIGINT) "
            "AS vocab_size FROM b ORDER BY bucket"),
        "embedding_covariance": (
            "WITH q AS (SELECT vec_id, t.i AS i, "
            "CAST(round(CAST(embedding[CAST(t.i AS INTEGER) + 1] "
            "AS DOUBLE) * 1000000) "
            "AS BIGINT) AS v FROM embeddings, range(64) t(i)), "
            "p AS (SELECT a.i AS i, b.i AS j, count(*) AS n, "
            "sum(CAST(a.v AS HUGEINT) * b.v) AS sxy, "
            "sum(CAST(a.v AS HUGEINT)) AS sx, "
            "sum(CAST(b.v AS HUGEINT)) AS sy "
            "FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i "
            "GROUP BY 1, 2) "
            "SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, "
            "CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE) "
            "/ CAST(n * n AS DOUBLE) AS cov_micro2 "
            "FROM p ORDER BY i, j"),
        "fk_violations": (
            "WITH checks AS ("
            "SELECT 'documents_empty_text' AS chk, count(*) FILTER ("
            "text IS NULL OR length(text) = 0) AS n FROM documents "
            "UNION ALL SELECT 'lineitem_nonpositive_qty', "
            "count(*) FILTER (l_quantity <= 0) FROM lineitem "
            "UNION ALL SELECT 'lineitem_orderkey_orphans', count(*) "
            "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_orderkey = l.l_orderkey) "
            "UNION ALL SELECT 'lineitem_partkey_orphans', count(*) "
            "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p "
            "WHERE p.p_partkey = l.l_partkey) "
            "UNION ALL SELECT 'lineitem_suppkey_orphans', count(*) "
            "FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s "
            "WHERE s.s_suppkey = l.l_suppkey) "
            "UNION ALL SELECT 'orders_custkey_orphans', count(*) "
            "FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c "
            "WHERE c.c_custkey = o.o_custkey)) "
            "SELECT chk AS \"check\", CAST(n AS BIGINT) AS n_violations "
            "FROM checks ORDER BY 1"),
        "doc_novelty": (
            "WITH toks AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '\\S+') AS ws "
            "FROM documents), "
            "tri AS (SELECT DISTINCT doc_id, ws[u.i] || ' ' || "
            "ws[u.i+1] || ' ' || ws[u.i+2] AS term FROM toks, "
            "unnest(range(1, greatest(len(ws) - 1, 1))) u(i)), "
            "f AS (SELECT term, min(doc_id) AS fd FROM tri GROUP BY 1), "
            "per AS (SELECT t.doc_id, count(*) AS n_tri, "
            "sum(CASE WHEN f.fd = t.doc_id THEN 1 ELSE 0 END) AS n_new "
            "FROM tri t JOIN f ON f.term = t.term GROUP BY 1) "
            "SELECT doc_id, CAST(n_tri AS BIGINT) AS n_tri, "
            "CAST(n_new AS BIGINT) AS n_new, "
            "CAST(1000000 * n_new // n_tri AS BIGINT) AS novelty_ppm "
            "FROM per ORDER BY novelty_ppm, doc_id LIMIT 20"),
        "term_keyness": (
            "WITH w AS (SELECT source, "
            "unnest(regexp_extract_all(lower(text), '\\S+')) AS term "
            "FROM documents), "
            "c AS (SELECT source, term, count(*) AS a FROM w "
            "GROUP BY 1, 2), "
            "kt AS (SELECT term, sum(a) AS kt FROM c GROUP BY 1), "
            "ns AS (SELECT source, sum(a) AS ns FROM c GROUP BY 1), "
            "tot AS (SELECT sum(a) AS n FROM c), "
            "g AS (SELECT c.source, c.term, c.a AS k, "
            "(CASE WHEN c.a > 0 THEN CAST(floor(2.0 * c.a * "
            "ln(c.a * t.n / (kt.kt * ns.ns)) * 1000000000 + 0.5) "
            "AS BIGINT) ELSE 0 END "
            "+ CASE WHEN kt.kt - c.a > 0 THEN CAST(floor(2.0 * "
            "(kt.kt - c.a) * ln((kt.kt - c.a) * t.n / "
            "(kt.kt * (t.n - ns.ns))) * 1000000000 + 0.5) "
            "AS BIGINT) ELSE 0 END "
            "+ CASE WHEN ns.ns - c.a > 0 THEN CAST(floor(2.0 * "
            "(ns.ns - c.a) * ln((ns.ns - c.a) * t.n / "
            "((t.n - kt.kt) * ns.ns)) * 1000000000 + 0.5) "
            "AS BIGINT) ELSE 0 END "
            "+ CASE WHEN t.n - kt.kt - ns.ns + c.a > 0 THEN "
            "CAST(floor(2.0 * (t.n - kt.kt - ns.ns + c.a) * "
            "ln((t.n - kt.kt - ns.ns + c.a) * t.n / "
            "((t.n - kt.kt) * (t.n - ns.ns))) * 1000000000 + 0.5) "
            "AS BIGINT) ELSE 0 END) AS g2_nano "
            "FROM c JOIN kt USING (term) JOIN ns USING (source) "
            "CROSS JOIN tot t) "
            "SELECT source, term, CAST(k AS BIGINT) AS k, g2_nano "
            "FROM g ORDER BY g2_nano DESC, source, term LIMIT 20"),
        "truncation_twins": (
            "SELECT substr(text, 1, 50) AS prefix, "
            "CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(min(n_chars) AS BIGINT) AS min_chars, "
            "CAST(max(n_chars) AS BIGINT) AS max_chars, "
            "CAST(max(n_chars) - min(n_chars) AS BIGINT) AS len_spread "
            "FROM documents GROUP BY 1 HAVING count(*) >= 2 "
            "ORDER BY n_docs DESC, prefix"),
        "last_touch_attribution": (
            "WITH e AS (SELECT user_id, ts, event_id, event_type, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type IN ('click', 'purchase')), "
            "s AS (SELECT *, "
            "last_value(CASE WHEN event_type = 'click' THEN item END "
            "IGNORE NULLS) OVER w AS last_item, "
            "last_value(CASE WHEN event_type = 'click' THEN ts END "
            "IGNORE NULLS) OVER w AS last_ts FROM e "
            "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
            "SELECT last_item AS item, "
            "CAST(count(*) AS BIGINT) AS n_purchases FROM s "
            "WHERE event_type = 'purchase' AND last_ts IS NOT NULL "
            "AND epoch_us(ts) - epoch_us(last_ts) <= 86400000000 "
            "GROUP BY 1 ORDER BY n_purchases DESC, item LIMIT 20"),
        "upsert_orders": (
            "WITH base AS (SELECT o_orderkey, o_orderstatus, 1 AS v, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents "
            "FROM orders "
            "UNION ALL SELECT o_orderkey, o_orderstatus, 2 AS v, "
            "CAST(round(o_totalprice * 100) AS BIGINT) + 1000 "
            "FROM orders WHERE o_orderkey % 7 = 0), "
            "w AS (SELECT o_orderkey, o_orderstatus, cents, "
            "row_number() OVER (PARTITION BY o_orderkey "
            "ORDER BY v DESC) AS rn FROM base) "
            "SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(cents) AS BIGINT) AS revenue_cents "
            "FROM w WHERE rn = 1 GROUP BY 1 ORDER BY 1"),
        "cheapest_supplier": (
            "WITH ps AS (SELECT l_partkey, l_suppkey, "
            "min(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost_c "
            "FROM lineitem "
            "JOIN part p ON p.p_partkey = l_partkey "
            "AND p.p_type = 'SMALL' AND p.p_size <= 15 "
            "JOIN supplier s ON s.s_suppkey = l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN region r ON r.r_regionkey = n.n_regionkey "
            "WHERE r.r_name = 'EUROPE' GROUP BY 1, 2), "
            "m AS (SELECT *, min(cost_c) OVER (PARTITION BY l_partkey) "
            "AS cmin FROM ps) "
            "SELECT s.s_acctbal, s.s_name, n.n_name, m.l_partkey, "
            "p.p_name, m.cost_c "
            "FROM m JOIN supplier s ON s.s_suppkey = m.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN part p ON p.p_partkey = m.l_partkey "
            "WHERE m.cost_c = m.cmin "
            "ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, m.l_partkey "
            "LIMIT 100"),
        "product_profit": (
            "SELECT n.n_name AS n_name, "
            "CAST(year(o.o_orderdate) AS BIGINT) AS o_year, "
            "CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l.l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS profit_c4 "
            "FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation n ON n.n_nationkey = s.s_nationkey "
            "JOIN orders o ON o.o_orderkey = l.l_orderkey "
            "WHERE p.p_name LIKE '%gear%' "
            "GROUP BY 1, 2 ORDER BY n_name, o_year DESC"),
        "important_parts": (
            "WITH pr AS (SELECT l_partkey, "
            "CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l_discount) * 100) AS BIGINT)) AS BIGINT) "
            "AS value_c4 FROM lineitem GROUP BY 1) "
            "SELECT l_partkey, value_c4 FROM pr "
            "WHERE value_c4 * 10000 > (SELECT sum(value_c4) FROM pr) "
            "ORDER BY value_c4 DESC, l_partkey"),
        "shipmode_priority": (
            "SELECT CAST(year(l.l_shipdate) AS BIGINT) AS ship_year, "
            "CAST(sum(CASE WHEN o.o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) "
            "AS high_line_count, "
            "CAST(sum(CASE WHEN o.o_orderpriority IN "
            "('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) "
            "AS low_line_count "
            "FROM lineitem l JOIN orders o "
            "ON o.o_orderkey = l.l_orderkey "
            "WHERE CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) "
            "- CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) "
            ">= 60 "
            "GROUP BY 1 ORDER BY 1"),
        "part_supplier_variety": (
            "WITH d AS (SELECT DISTINCT p.p_brand, p.p_type, p.p_size, "
            "l.l_suppkey FROM lineitem l "
            "JOIN part p ON p.p_partkey = l.l_partkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "WHERE p.p_type <> 'PROMO' AND s.s_acctbal >= 0) "
            "SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, "
            "CAST(count(*) AS BIGINT) AS supplier_cnt "
            "FROM d GROUP BY 1, 2, 3 "
            "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size "
            "LIMIT 40"),
        "promotion_suppliers": (
            "WITH ps AS (SELECT l_partkey, l_suppkey, "
            "CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) "
            "AS qty FROM lineitem "
            "JOIN part p ON p.p_partkey = l_partkey "
            "WHERE p.p_name LIKE '%bolt%' AND year(l_shipdate) = 1996 "
            "GROUP BY 1, 2), "
            "w AS (SELECT *, sum(qty) OVER (PARTITION BY l_partkey) "
            "AS tot FROM ps) "
            "SELECT s.s_suppkey, s.s_name, n.n_name "
            "FROM supplier s JOIN nation n "
            "ON n.n_nationkey = s.s_nationkey "
            "WHERE s.s_suppkey IN "
            "(SELECT DISTINCT l_suppkey FROM w WHERE 2 * qty > tot) "
            "ORDER BY s.s_name, s.s_suppkey"),
        "qty_price_slope": (
            "WITH b AS (SELECT p.p_brand AS p_brand, "
            "CAST(round(l_quantity) AS BIGINT) AS x, "
            "CAST(round(l_extendedprice * 100) AS BIGINT) AS y "
            "FROM lineitem JOIN part p ON p.p_partkey = l_partkey), "
            "s AS (SELECT p_brand, CAST(count(*) AS HUGEINT) AS n, "
            "CAST(sum(x) AS HUGEINT) AS sx, "
            "CAST(sum(y) AS HUGEINT) AS sy, "
            "CAST(sum(x * y) AS HUGEINT) AS sxy, "
            "CAST(sum(x * x) AS HUGEINT) AS sxx "
            "FROM b GROUP BY 1) "
            "SELECT p_brand, CAST(n AS BIGINT) AS n, "
            "CAST(n * sxy - sx * sy AS VARCHAR) AS slope_num, "
            "CAST(n * sxx - sx * sx AS VARCHAR) AS slope_den "
            "FROM s ORDER BY p_brand"),
        "k_anonymity": (
            "SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, "
            "c_mktsegment, CAST(count(*) AS BIGINT) AS n "
            "FROM customer GROUP BY 1, 2 HAVING count(*) < 10 "
            "ORDER BY 1, 2"),
        "segment_ttest": (
            "WITH x AS (SELECT c_mktsegment AS seg, "
            "CAST(round(c_acctbal * 100) AS BIGINT) AS c "
            "FROM customer), "
            "s AS (SELECT seg, count(*) AS n, "
            "CAST(sum(c) AS HUGEINT) AS s, "
            "CAST(sum(c * c) AS HUGEINT) AS ss FROM x GROUP BY 1), "
            "d AS (SELECT seg, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) "
            "AS m, (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * "
            "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) / "
            "CAST(n - 1 AS DOUBLE) AS v FROM s) "
            "SELECT a.seg AS seg_a, b.seg AS seg_b, "
            "CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b, "
            "(a.m - b.m) / sqrt(a.v / CAST(a.n AS DOUBLE) + "
            "b.v / CAST(b.n AS DOUBLE)) AS t_stat "
            "FROM d a JOIN d b ON a.seg < b.seg "
            "ORDER BY seg_a, seg_b"),
        "event_bursts": (
            "WITH e AS (SELECT user_id, "
            "CAST(epoch_us(ts) AS BIGINT) AS t FROM events), "
            "w AS (SELECT user_id, count(*) OVER (PARTITION BY user_id "
            "ORDER BY t RANGE BETWEEN CURRENT ROW "
            "AND 60000000 FOLLOWING) AS c FROM e) "
            "SELECT CAST(user_id AS BIGINT) AS user_id, "
            "CAST(max(c) AS BIGINT) AS max_burst "
            "FROM w GROUP BY 1 ORDER BY 1"),
        "sorted_neighbor_dups": (
            "WITH t AS (SELECT doc_id, lower(text) AS lt, "
            "substr(lower(text), 1, 16) AS k FROM documents), "
            "r AS (SELECT doc_id, lt, "
            "row_number() OVER (ORDER BY k, doc_id) AS rn FROM t), "
            "p AS (SELECT a.doc_id AS left_id, b.doc_id AS right_id, "
            "a.lt AS ta, b.lt AS tb FROM r a JOIN r b "
            "ON b.rn - a.rn BETWEEN 1 AND 3), "
            "j AS (SELECT left_id, right_id, "
            "len(list_intersect("
            "list_filter(list_distinct(string_split_regex(ta, '\\s+')), "
            "x -> x <> ''), "
            "list_filter(list_distinct(string_split_regex(tb, '\\s+')), "
            "x -> x <> ''))) AS c, "
            "len(list_filter(list_distinct(string_split_regex(ta, "
            "'\\s+')), x -> x <> '')) AS na, "
            "len(list_filter(list_distinct(string_split_regex(tb, "
            "'\\s+')), x -> x <> '')) AS nb FROM p) "
            "SELECT left_id, right_id, CAST(c AS BIGINT) AS n_common "
            "FROM j WHERE c > 0 AND 2 * c >= na + nb - c "
            "ORDER BY 1, 2"),
        "winsorized_chars": (
            "WITH c AS (SELECT lang, CAST(n_chars AS BIGINT) AS v "
            "FROM documents), "
            "r AS (SELECT lang, v, "
            "row_number() OVER (PARTITION BY lang ORDER BY v) AS rn, "
            "count(*) OVER (PARTITION BY lang) AS n FROM c), "
            "cuts AS (SELECT lang, CAST(max(n) AS BIGINT) AS n, "
            "max(CASE WHEN rn = (n * 5 + 99) // 100 THEN v END) "
            "AS lo_cut, "
            "max(CASE WHEN rn = (n * 95 + 99) // 100 THEN v END) "
            "AS hi_cut FROM r GROUP BY 1) "
            "SELECT c.lang, cuts.n, cuts.lo_cut, cuts.hi_cut, "
            "CAST(sum(least(greatest(c.v, cuts.lo_cut), cuts.hi_cut)) "
            "AS BIGINT) AS win_sum "
            "FROM c JOIN cuts ON cuts.lang = c.lang "
            "GROUP BY 1, 2, 3, 4 ORDER BY 1"),
        "assoc_rules": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "ic AS (SELECT item, CAST(count(*) AS BIGINT) AS c "
            "FROM ui GROUP BY 1), "
            "p AS (SELECT a.item AS item_a, b.item AS item_b, "
            "CAST(count(*) AS BIGINT) AS n_both FROM ui a "
            "JOIN ui b ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "top AS (SELECT * FROM p "
            "ORDER BY n_both DESC, item_a, item_b LIMIT 50) "
            "SELECT t.item_a, t.item_b, t.n_both, "
            "ia.c AS n_a, ib.c AS n_b, "
            "CAST((1000000 * t.n_both) // ia.c AS BIGINT) "
            "AS conf_ab_ppm, "
            "CAST((1000000 * t.n_both) // ib.c AS BIGINT) "
            "AS conf_ba_ppm "
            "FROM top t JOIN ic ia ON ia.item = t.item_a "
            "JOIN ic ib ON ib.item = t.item_b "
            "ORDER BY t.n_both DESC, t.item_a, t.item_b"),
        "geo_mean_chars": (
            "WITH c AS (SELECT lang, CAST(n_chars AS BIGINT) AS v "
            "FROM documents WHERE n_chars >= 1), "
            "s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(floor(ln(CAST(v AS DOUBLE)) * 1e9 + 0.5) "
            "AS BIGINT)) AS BIGINT) AS sum_ln_nano FROM c GROUP BY 1) "
            "SELECT lang, n, sum_ln_nano, "
            "CAST(floor(exp(CAST(sum_ln_nano AS DOUBLE) / 1e9 "
            "/ CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS gm_micro "
            "FROM s ORDER BY lang"),
        "time_weighted_value": (
            "WITH o AS (SELECT user_id, "
            "CAST(round(value * 100) AS BIGINT) AS cents, "
            "epoch_us(ts) AS t, "
            "lead(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS nt FROM events), "
            "i AS (SELECT user_id, cents, (nt - t) // 1000000 AS dt "
            "FROM o WHERE nt IS NOT NULL), "
            "g AS (SELECT user_id, CAST(count(*) AS BIGINT) "
            "AS n_intervals, CAST(sum(dt) AS BIGINT) AS sum_dt_sec, "
            "CAST(sum(cents * dt) AS BIGINT) AS num FROM i "
            "GROUP BY 1) "
            "SELECT user_id, n_intervals, sum_dt_sec, "
            "CAST((100 * num) // sum_dt_sec AS BIGINT) AS twa_centi "
            "FROM g WHERE sum_dt_sec > 0 ORDER BY user_id"),
        "bounce_rate": (
            "WITH o AS (SELECT user_id, event_type, ts, event_id, "
            "lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS pts FROM events), "
            "m AS (SELECT *, CASE WHEN pts IS NULL OR "
            "epoch_us(ts) - epoch_us(pts) > 1800000000 "
            "THEN 1 ELSE 0 END AS is_new FROM o), "
            "s AS (SELECT user_id, event_type, "
            "sum(is_new) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM m), "
            "g AS (SELECT user_id, sid, "
            "CAST(count(*) AS BIGINT) AS ne, "
            "arg_min(event_type, rn) AS entry_type FROM s "
            "GROUP BY 1, 2) "
            "SELECT entry_type, CAST(count(*) AS BIGINT) AS n_sessions, "
            "CAST(sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_bounces, "
            "CAST((1000000 * sum(CASE WHEN ne = 1 THEN 1 ELSE 0 END)) "
            "// count(*) AS BIGINT) AS bounce_ppm "
            "FROM g GROUP BY 1 ORDER BY 1"),
        "vocab_jaccard_langs": (
            "WITH v AS (SELECT DISTINCT lang, tok FROM ("
            "SELECT lang, unnest(regexp_extract_all(lower(text), "
            "'\\S+')) AS tok FROM documents)), "
            "c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n "
            "FROM v GROUP BY 1), "
            "p AS (SELECT a.lang AS la, b.lang AS lb, "
            "CAST(count(*) AS BIGINT) AS cmn FROM v a "
            "JOIN v b ON a.tok = b.tok AND a.lang < b.lang "
            "GROUP BY 1, 2) "
            "SELECT p.la AS lang_a, p.lb AS lang_b, "
            "ca.n AS n_a, cb.n AS n_b, p.cmn AS n_common, "
            "CAST((1000000 * p.cmn) // (ca.n + cb.n - p.cmn) "
            "AS BIGINT) AS jaccard_ppm "
            "FROM p JOIN c ca ON ca.lang = p.la "
            "JOIN c cb ON cb.lang = p.lb ORDER BY 1, 2"),
        "score_calibration": (
            "WITH o AS (SELECT "
            "CAST(round(value * 100) AS BIGINT) AS c, event_id, "
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p "
            "FROM events), "
            "b AS (SELECT ntile(10) OVER (ORDER BY c, event_id) "
            "AS bin, p FROM o) "
            "SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n, "
            "CAST(sum(p) AS BIGINT) AS n_pos, "
            "CAST((1000000 * sum(p)) // count(*) AS BIGINT) "
            "AS pos_rate_ppm FROM b GROUP BY 1 ORDER BY 1"),
        "cross_source_dups": (
            "WITH v AS (SELECT DISTINCT source, "
            "md5(substr(text, 1, 200)) AS h FROM documents), "
            "c AS (SELECT source, CAST(count(*) AS BIGINT) AS n "
            "FROM v GROUP BY 1), "
            "p AS (SELECT a.source AS sa, b.source AS sb, "
            "CAST(count(*) AS BIGINT) AS cmn FROM v a "
            "JOIN v b ON a.h = b.h AND a.source < b.source "
            "GROUP BY 1, 2) "
            "SELECT p.sa AS source_a, p.sb AS source_b, "
            "ca.n AS n_a, cb.n AS n_b, p.cmn AS n_common, "
            "CAST((1000000 * p.cmn) // (ca.n + cb.n - p.cmn) "
            "AS BIGINT) AS jaccard_ppm "
            "FROM p JOIN c ca ON ca.source = p.sa "
            "JOIN c cb ON cb.source = p.sb ORDER BY 1, 2"),
        "user_recs": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, "
            "count(*) AS c FROM ui a JOIN ui b "
            "ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "d AS (SELECT ia AS item, ib AS nbr, c FROM pairs "
            "UNION ALL SELECT ib, ia, c FROM pairs), "
            "nb AS (SELECT item, nbr, c FROM (SELECT item, nbr, c, "
            "row_number() OVER (PARTITION BY item "
            "ORDER BY c DESC, nbr) AS rnk FROM d) WHERE rnk <= 5), "
            "cand AS (SELECT u.user_id, nb.nbr AS item, "
            "CAST(sum(nb.c) AS BIGINT) AS score FROM ui u "
            "JOIN nb ON nb.item = u.item GROUP BY 1, 2), "
            "unseen AS (SELECT c.* FROM cand c "
            "LEFT JOIN ui s ON s.user_id = c.user_id "
            "AND s.item = c.item WHERE s.item IS NULL), "
            "r AS (SELECT user_id, item, score, "
            "CAST(row_number() OVER (PARTITION BY user_id "
            "ORDER BY score DESC, item) AS BIGINT) AS rnk "
            "FROM unseen) "
            "SELECT user_id, rnk, item, score FROM r WHERE rnk <= 3 "
            "ORDER BY user_id, rnk"),
        "embedding_dim_median": (
            "WITH q AS (SELECT CAST(t.i + 1 AS BIGINT) AS dim, "
            "CAST(round(CAST(embedding[CAST(t.i AS INTEGER) + 1] "
            "AS DOUBLE) * 1000000) AS BIGINT) AS v "
            "FROM embeddings, range(64) t(i)), "
            "c AS (SELECT dim, v, CAST(count(*) AS BIGINT) AS w "
            "FROM q GROUP BY 1, 2), "
            "s AS (SELECT dim, v, "
            "sum(w) OVER (PARTITION BY dim ORDER BY v) AS cw, "
            "sum(w) OVER (PARTITION BY dim) AS tot FROM c) "
            "SELECT dim, CAST(min(tot) AS BIGINT) AS n, "
            "CAST(min(v) AS BIGINT) AS median_micro FROM s "
            "WHERE 2 * cw >= tot GROUP BY dim ORDER BY dim"),
        "improving_users": (
            "WITH p AS (SELECT user_id, "
            "epoch_us(ts) // 604800000000 AS wk, "
            "CAST(count(*) AS BIGINT) AS c FROM events "
            "WHERE event_type = 'purchase' GROUP BY 1, 2), "
            "w AS (SELECT user_id, wk, c, "
            "lag(c) OVER (PARTITION BY user_id ORDER BY wk) AS pc "
            "FROM p), "
            "g AS (SELECT user_id, CAST(count(*) AS BIGINT) "
            "AS n_weeks, CAST(arg_min(c, wk) AS BIGINT) AS first_cnt, "
            "CAST(arg_max(c, wk) AS BIGINT) AS last_cnt, "
            "bool_and(pc IS NULL OR c >= pc) AS ok FROM w GROUP BY 1) "
            "SELECT user_id, n_weeks, first_cnt, last_cnt FROM g "
            "WHERE ok AND n_weeks >= 3 ORDER BY user_id"),
        "revenue_changepoint": (
            "WITH d AS (SELECT "
            "epoch_us(o_orderdate) // 86400000000 AS day, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS cents FROM orders GROUP BY 1), "
            "s AS (SELECT day, cents, "
            "row_number() OVER (ORDER BY day) AS k, "
            "sum(cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) "
            "AS p, count(*) OVER () AS n, sum(cents) OVER () AS tot "
            "FROM d), "
            "v AS (SELECT day, k, n, "
            "abs(CAST(n AS HUGEINT) * p - CAST(k AS HUGEINT) * tot) "
            "AS val FROM s) "
            "SELECT CAST(day AS BIGINT) AS day, CAST(k AS BIGINT) AS k, "
            "CAST(n AS BIGINT) AS n_days, "
            "CAST(val AS BIGINT) AS cusum_abs FROM v "
            "ORDER BY val DESC, k LIMIT 1"),
        "source_ttr": (
            "WITH w AS (SELECT source, "
            "unnest(regexp_extract_all(lower(text), '\\S+')) AS tok "
            "FROM documents), "
            "g AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c "
            "FROM w GROUP BY 1, 2) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_types, "
            "CAST(sum(c) AS BIGINT) AS n_tokens, "
            "CAST(sum(length(tok) * c) AS BIGINT) AS sum_chars, "
            "CAST((1000000 * count(*)) // sum(c) AS BIGINT) AS ttr_ppm "
            "FROM g GROUP BY 1 ORDER BY 1"),
        "trailing_spend": (
            "WITH p AS (SELECT event_id, user_id, ts, "
            "CAST(round(value * 100) AS BIGINT) AS cents FROM events "
            "WHERE event_type = 'purchase') "
            "SELECT event_id, user_id, "
            "CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts "
            "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) "
            "AS BIGINT) AS spend_1h_c FROM p ORDER BY event_id"),
        "merge_orders": (
            "WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS s, "
            "CAST(round(o_totalprice * 100) AS BIGINT) AS c "
            "FROM orders), "
            "kept AS (SELECT k, s, CASE WHEN k % 11 = 0 THEN c + 1000 "
            "ELSE c END AS c FROM base WHERE k % 13 <> 0), "
            "ins AS (SELECT k + 1000000000 AS k, 'N' AS s, "
            "CAST(5000 AS BIGINT) AS c FROM base WHERE k % 17 = 0), "
            "m AS (SELECT * FROM kept UNION ALL SELECT * FROM ins) "
            "SELECT s AS o_orderstatus, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(c) AS BIGINT) AS revenue_cents FROM m "
            "GROUP BY 1 ORDER BY 1"),
        "smb_join_revenue": (
            "SELECT c.c_mktsegment, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents "
            "FROM orders o JOIN customer c "
            "ON o.o_custkey = c.c_custkey "
            "GROUP BY 1 ORDER BY 1"),
        "rapid_reorders": (
            "WITH o AS (SELECT o_custkey AS custkey, o_orderkey, "
            "o_orderdate, lag(o_orderdate) OVER (PARTITION BY "
            "o_custkey ORDER BY o_orderdate, o_orderkey) AS pd "
            "FROM orders), "
            "g AS (SELECT custkey, CAST(count(*) AS BIGINT) "
            "AS n_orders, CAST(sum(CASE WHEN pd IS NOT NULL AND "
            "epoch_us(o_orderdate) - epoch_us(pd) <= 86400000000 "
            "THEN 1 ELSE 0 END) AS BIGINT) AS n_rapid FROM o "
            "GROUP BY 1) "
            "SELECT custkey, n_orders, n_rapid FROM g "
            "WHERE n_rapid >= 1 ORDER BY custkey"),
        "item_abandonment": (
            "WITH u AS (SELECT DISTINCT "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item, "
            "event_type AS etype, user_id FROM events "
            "WHERE event_type IN ('view', 'purchase')), "
            "g AS (SELECT item, "
            "CAST(sum(CASE WHEN etype = 'view' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS viewers, "
            "CAST(sum(CASE WHEN etype = 'purchase' THEN 1 ELSE 0 END) "
            "AS BIGINT) AS buyers FROM u GROUP BY 1) "
            "SELECT item, viewers, buyers, "
            "CAST((1000000 * buyers) // viewers AS BIGINT) AS conv_ppm "
            "FROM g WHERE viewers > 0 ORDER BY item"),
        "events_grouping_sets": (
            "SELECT COALESCE(event_type, 'ALL') AS etype, "
            "COALESCE(h, -1) AS hour, count(*) AS n FROM ("
            "SELECT event_type, "
            "CAST(extract(hour FROM ts) AS BIGINT) AS h FROM events) "
            "GROUP BY GROUPING SETS ((event_type), (h), "
            "(event_type, h), ()) ORDER BY 1, 2"),
        "weekday_revenue": (
            "SELECT CAST(isodow(o_orderdate) AS BIGINT) AS isodow, "
            "count(*) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents FROM orders "
            "GROUP BY 1 ORDER BY 1"),
        "fim_split": (
            "WITH d AS (SELECT doc_id, text, length(text) AS n "
            "FROM documents WHERE length(text) >= 3), "
            "c AS (SELECT doc_id, text, n, "
            "CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id "
            "AS VARCHAR), ':1')), 1, 8)) AS UBIGINT) "
            "% CAST(n - 1 AS UBIGINT) + 1 AS BIGINT) AS a, "
            "CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id "
            "AS VARCHAR), ':2')), 1, 8)) AS UBIGINT) "
            "% CAST(n - 1 AS UBIGINT) + 1 AS BIGINT) AS b FROM d), "
            "p AS (SELECT doc_id, text, n, least(a, b) AS p1, "
            "greatest(a, b) AS p2 FROM c) "
            "SELECT doc_id, CAST(n AS BIGINT) AS n_chars, p1, p2, "
            "md5(concat(substr(text, p2 + 1), substr(text, 1, p1), "
            "substr(text, p1 + 1, p2 - p1))) AS spm_md5 "
            "FROM p ORDER BY doc_id"),
        "exact_median_price": (
            "WITH v AS (SELECT CAST(round(l_extendedprice * 100) "
            "AS BIGINT) AS c FROM lineitem), "
            "n AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST((count(*) + 1) // 2 AS BIGINT) AS k FROM v) "
            "SELECT n.n, n.k, (SELECT c FROM v ORDER BY c "
            "LIMIT 1 OFFSET (SELECT k - 1 FROM n)) AS median_cents "
            "FROM n"),
        "linear_attribution": (
            "WITH e AS (SELECT user_id, ts, event_id, event_type, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item, "
            "row_number() OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) AS rn FROM events "
            "WHERE event_type IN ('click', 'purchase')), "
            "p AS (SELECT user_id, ts, rn FROM e "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, ts, rn, item FROM e "
            "WHERE event_type = 'click'), "
            "j AS (SELECT p.user_id, p.rn AS prn, c.item FROM p "
            "JOIN c ON c.user_id = p.user_id AND c.rn < p.rn "
            "AND epoch_us(p.ts) - epoch_us(c.ts) <= 86400000000), "
            "g AS (SELECT item, 1000000 // (count(*) OVER "
            "(PARTITION BY user_id, prn)) AS cr FROM j), "
            "a AS (SELECT item, CAST(count(*) AS BIGINT) "
            "AS n_touches, CAST(sum(cr) AS BIGINT) AS credit_ppm "
            "FROM g GROUP BY 1) "
            "SELECT item, n_touches, credit_ppm FROM a "
            "ORDER BY credit_ppm DESC, item LIMIT 20"),
        "dp_lang_counts": (
            "WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n "
            "FROM documents GROUP BY 1), "
            "u AS (SELECT lang, n, (CAST(CAST(concat('0x', "
            "substr(md5(concat('dp:', lang)), 1, 8)) AS UBIGINT) "
            "AS DOUBLE) + 0.5) / 4294967296.0 AS uu FROM c), "
            "s AS (SELECT lang, n, uu - 0.5 AS sv FROM u) "
            "SELECT lang, n AS n_true, "
            "CAST(floor(CAST(n AS DOUBLE) + "
            "(-1.0 * (CASE WHEN sv >= 0 THEN 1.0 ELSE -1.0 END) * "
            "ln(1.0 - 2.0 * abs(sv)))) AS BIGINT) AS n_dp "
            "FROM s ORDER BY lang"),
        "event_debounce": (
            "WITH RECURSIVE e AS (SELECT user_id, event_type, "
            "event_id, epoch_us(ts) AS t, row_number() OVER "
            "(PARTITION BY user_id, event_type ORDER BY ts, event_id) "
            "AS rn FROM events), "
            "k AS (SELECT user_id, event_type, event_id, t, rn "
            "FROM e WHERE rn = 1 "
            "UNION ALL "
            "SELECT n1.user_id, n1.event_type, n1.event_id, n1.t, "
            "n1.rn FROM k JOIN e n1 ON n1.user_id = k.user_id "
            "AND n1.event_type = k.event_type AND n1.rn > k.rn "
            "AND n1.t >= k.t + 86400000000 "
            "WHERE NOT EXISTS (SELECT 1 FROM e n2 "
            "WHERE n2.user_id = n1.user_id "
            "AND n2.event_type = n1.event_type AND n2.rn > k.rn "
            "AND n2.t >= k.t + 86400000000 AND n2.rn < n1.rn)) "
            "SELECT user_id, event_type, event_id, t AS ts_us "
            "FROM k ORDER BY user_id, event_type, ts_us"),
        "link_prediction": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, "
            "count(*) AS n FROM ui a JOIN ui b "
            "ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib FROM pairs WHERE n >= 2), "
            "adj AS (SELECT ia AS node, ib AS nbr FROM edges "
            "UNION ALL SELECT ib, ia FROM edges), "
            "w AS (SELECT node, CAST(floor(1000000000.0 / "
            "ln(CAST(count(*) AS DOUBLE)) + 0.5) AS BIGINT) AS wn "
            "FROM adj GROUP BY 1), "
            "wedge AS (SELECT a.nbr AS x, b.nbr AS y, w.wn FROM adj a "
            "JOIN adj b ON a.node = b.node AND a.nbr < b.nbr "
            "JOIN w ON w.node = a.node), "
            "cand AS (SELECT x, y, CAST(sum(wn) AS BIGINT) "
            "AS score_nano, CAST(count(*) AS BIGINT) AS n_common "
            "FROM wedge GROUP BY 1, 2), "
            "nonedge AS (SELECT c.* FROM cand c LEFT JOIN edges e "
            "ON e.ia = c.x AND e.ib = c.y WHERE e.ia IS NULL) "
            "SELECT x AS item_a, y AS item_b, n_common, score_nano "
            "FROM nonedge ORDER BY score_nano DESC, item_a, item_b "
            "LIMIT 20"),
        "revenue_trend_mk": (
            "WITH d AS (SELECT CAST(epoch_us(o_orderdate) // "
            "86400000000 AS BIGINT) AS day, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rev_c FROM orders GROUP BY 1), "
            "p AS (SELECT b.day - a.day AS dx, b.rev_c - a.rev_c AS dy "
            "FROM d a JOIN d b ON b.day > a.day) "
            "SELECT (SELECT CAST(count(*) AS BIGINT) FROM d) AS n_days, "
            "CAST(count(*) AS BIGINT) AS n_pairs, "
            "CAST(sum(CASE WHEN dy > 0 THEN 1 WHEN dy < 0 THEN -1 "
            "ELSE 0 END) AS BIGINT) AS s_stat, "
            "quantile_disc(CAST(dy AS DOUBLE) / dx, 0.5) AS theil_sen "
            "FROM p"),
        "revenue_ewma": (
            "WITH RECURSIVE d AS (SELECT CAST(epoch_us(o_orderdate) // "
            "86400000000 AS BIGINT) AS day, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rev_c FROM orders GROUP BY 1), "
            "r AS (SELECT row_number() OVER (ORDER BY day) AS rn, "
            "day, rev_c FROM d), "
            "s AS (SELECT rn, day, rev_c, CAST(rev_c AS DOUBLE) AS ewma "
            "FROM r WHERE rn = 1 "
            "UNION ALL "
            "SELECT r.rn, r.day, r.rev_c, "
            "0.2 * CAST(r.rev_c AS DOUBLE) + 0.8 * s.ewma "
            "FROM s JOIN r ON r.rn = s.rn + 1) "
            "SELECT day, rev_c, ewma FROM s"),
        "event_trigrams": (
            "WITH s AS (SELECT user_id, event_type, "
            "lead(event_type, 1) OVER w AS t2, "
            "lead(event_type, 2) OVER w AS t3 FROM events "
            "WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)) "
            "SELECT event_type AS t1, t2, t3, "
            "CAST(count(*) AS BIGINT) AS n FROM s "
            "WHERE t3 IS NOT NULL GROUP BY 1, 2, 3 "
            "ORDER BY t1, t2, t3"),
        "ltv_cohort_curve": (
            "WITH fw AS (SELECT user_id, min(CAST(epoch_us(ts) // "
            "604800000000 AS BIGINT)) AS cw FROM events GROUP BY 1), "
            "p AS (SELECT user_id, CAST(epoch_us(ts) // 604800000000 "
            "AS BIGINT) AS w, CAST(round(value * 100) AS BIGINT) AS c "
            "FROM events WHERE event_type = 'purchase'), "
            "cell AS (SELECT fw.cw AS cohort_week, p.w - fw.cw "
            "AS age_week, CAST(sum(p.c) AS BIGINT) AS rev_c "
            "FROM p JOIN fw ON p.user_id = fw.user_id GROUP BY 1, 2) "
            "SELECT cohort_week, age_week, rev_c, "
            "CAST(sum(rev_c) OVER (PARTITION BY cohort_week "
            "ORDER BY age_week) AS BIGINT) AS cum_rev_c FROM cell "
            "ORDER BY cohort_week, age_week"),
        "lang_chars_moments": (
            "WITH s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n, "
            "sum(CAST(n_chars AS HUGEINT)) AS s1, "
            "sum(CAST(n_chars AS HUGEINT) * n_chars) AS s2, "
            "sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars) AS s3, "
            "sum(CAST(n_chars AS HUGEINT) * n_chars * n_chars "
            "* n_chars) AS s4 FROM documents GROUP BY 1), "
            "m AS (SELECT lang, n, CAST(s1 AS DOUBLE) / n AS mean, "
            "CAST(s2 AS DOUBLE) / n AS r2, "
            "CAST(s3 AS DOUBLE) / n AS r3, "
            "CAST(s4 AS DOUBLE) / n AS r4 FROM s), "
            "mm AS (SELECT lang, n, mean, r2 - mean * mean AS m2, "
            "r3 - 3.0 * mean * r2 + 2.0 * mean * mean * mean AS m3, "
            "r4 - 4.0 * mean * r3 + 6.0 * mean * mean * r2 "
            "- 3.0 * mean * mean * mean * mean AS m4 FROM m) "
            "SELECT lang, n AS n_docs, mean AS mean_chars, "
            "m2 AS var_chars, m3 / (sqrt(m2) * m2) AS skew_chars, "
            "m4 / (m2 * m2) - 3.0 AS kurt_chars FROM mm "
            "ORDER BY lang"),
        "degree_assortativity": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "pairs AS (SELECT a.item AS ia, b.item AS ib, "
            "count(*) AS cnt FROM ui a JOIN ui b "
            "ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib FROM pairs WHERE cnt >= 2), "
            "adj AS (SELECT ia AS node, ib AS nbr FROM edges "
            "UNION ALL SELECT ib, ia FROM edges), "
            "deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d "
            "FROM adj GROUP BY 1), "
            "de AS (SELECT da.d AS x, db.d AS y FROM adj a "
            "JOIN deg da ON da.node = a.node "
            "JOIN deg db ON db.node = a.nbr), "
            "s AS (SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(x) AS BIGINT) AS sx, "
            "CAST(sum(y) AS BIGINT) AS sy, "
            "CAST(sum(x * x) AS BIGINT) AS sxx, "
            "CAST(sum(y * y) AS BIGINT) AS syy, "
            "CAST(sum(x * y) AS BIGINT) AS sxy FROM de) "
            "SELECT n // 2 AS n_edges, "
            "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
            "sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) "
            "* (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) "
            "AS assortativity FROM s"),
        "scd2_history": (
            "WITH p AS (SELECT user_id, epoch_us(ts) AS t, event_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'purchase'), "
            "o AS (SELECT user_id, t, item, lag(item) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id) AS pit "
            "FROM p), "
            "ch AS (SELECT user_id, item, t FROM o "
            "WHERE pit IS NULL OR pit <> item) "
            "SELECT user_id, item, t AS valid_from_us, "
            "coalesce(lead(t) OVER (PARTITION BY user_id ORDER BY t), "
            "-1) AS valid_to_us FROM ch "
            "ORDER BY user_id, valid_from_us"),
        "event_rle": (
            "WITH o AS (SELECT user_id, event_type, "
            "lag(event_type) OVER w AS pt, row_number() OVER w AS rn "
            "FROM events WINDOW w AS (PARTITION BY user_id "
            "ORDER BY ts, event_id)), "
            "f AS (SELECT user_id, rn, CASE WHEN pt IS NULL OR "
            "pt <> event_type THEN 1 ELSE 0 END AS st FROM o), "
            "g AS (SELECT user_id, rn, sum(st) OVER "
            "(PARTITION BY user_id ORDER BY rn) AS run_id FROM f), "
            "r AS (SELECT user_id, run_id, CAST(count(*) AS BIGINT) "
            "AS rl FROM g GROUP BY 1, 2) "
            "SELECT user_id, CAST(sum(rl) AS BIGINT) AS n_events, "
            "CAST(count(*) AS BIGINT) AS n_runs, "
            "CAST(max(rl) AS BIGINT) AS longest_run, "
            "CAST((1000000 * count(*)) // sum(rl) AS BIGINT) "
            "AS ratio_ppm FROM r GROUP BY 1 ORDER BY 1"),
        "media_dimensions": (
            "WITH r AS (SELECT doc_id, 'https://media.example/' || "
            "doc_id || '/img-0.png' AS media_ref FROM documents), "
            "d AS (SELECT doc_id, media_ref, "
            "CAST(concat('0x', substr(md5(media_ref), 1, 2)) "
            "AS INTEGER) AS b0, "
            "CAST(concat('0x', substr(md5(media_ref), 3, 2)) "
            "AS INTEGER) AS b1 FROM r) "
            "SELECT doc_id, media_ref, "
            "CAST(64 + b0 % 192 AS BIGINT) AS width, "
            "CAST(64 + b1 % 192 AS BIGINT) AS height, "
            "CAST(8 AS BIGINT) AS bit_depth, "
            "CAST(2 AS BIGINT) AS color_type FROM d ORDER BY doc_id"),
        "zonemap_prune": (
            "SELECT o_orderpriority AS priority, "
            "CAST(count(*) AS BIGINT) AS n_orders, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS revenue_cents FROM orders "
            "WHERE epoch_us(o_orderdate) // 86400000000 >= 10286 "
            "AND epoch_us(o_orderdate) // 86400000000 < 10317 "
            "GROUP BY 1 ORDER BY 1"),
        "funnel_1h": (
            "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t "
            "FROM events), "
            "p AS (SELECT user_id, t FROM e "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, t FROM e "
            "WHERE event_type = 'click'), "
            "v AS (SELECT user_id, t FROM e "
            "WHERE event_type = 'view'), "
            "okc AS (SELECT c.user_id, c.t FROM c "
            "WHERE EXISTS (SELECT 1 FROM v "
            "WHERE v.user_id = c.user_id AND v.t < c.t "
            "AND c.t - v.t <= 3600000000)), "
            "ap AS (SELECT p.user_id, p.t FROM p "
            "WHERE EXISTS (SELECT 1 FROM okc "
            "WHERE okc.user_id = p.user_id AND okc.t < p.t "
            "AND p.t - okc.t <= 3600000000)) "
            "SELECT pu.user_id, pu.np AS n_purchases, "
            "coalesce(au.na, 0) AS n_attributed "
            "FROM (SELECT user_id, CAST(count(*) AS BIGINT) AS np "
            "FROM p GROUP BY 1) pu "
            "LEFT JOIN (SELECT user_id, CAST(count(*) AS BIGINT) "
            "AS na FROM ap GROUP BY 1) au USING (user_id) "
            "ORDER BY user_id"),
        "kcore_items": (
            "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "prs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS n "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib FROM prs WHERE n >= 2), "
            "core AS (SELECT 0 AS rnd, ia AS node, ib AS nbr "
            "FROM edges UNION ALL SELECT 0, ib, ia FROM edges "
            "UNION ALL "
            "SELECT rnd, node, nbr FROM ("
            "WITH sel AS (SELECT rnd + 1 AS rnd, node, nbr, "
            "count(*) OVER (PARTITION BY node) AS dn FROM core), "
            "pairk AS (SELECT any_value(rnd) AS rnd, "
            "least(node, nbr) AS a, greatest(node, nbr) AS b, "
            "min(dn) AS md FROM sel GROUP BY 2, 3), "
            "surv AS (SELECT rnd, a AS node, b AS nbr FROM pairk "
            "WHERE md >= 5 UNION ALL SELECT rnd, b, a FROM pairk "
            "WHERE md >= 5) "
            "SELECT rnd, node, nbr FROM surv "
            "WHERE (SELECT count(*) FROM surv) "
            "< (SELECT count(*) FROM sel))), "
            "last AS (SELECT node, nbr FROM core "
            "WHERE rnd = (SELECT max(rnd) FROM core)), "
            "fin AS (SELECT node, nbr, count(*) OVER "
            "(PARTITION BY node) AS dn FROM last), "
            "fp AS (SELECT least(node, nbr) AS a, "
            "greatest(node, nbr) AS b, min(dn) AS md FROM fin "
            "GROUP BY 1, 2), "
            "fs AS (SELECT a AS node FROM fp WHERE md >= 5 "
            "UNION ALL SELECT b FROM fp WHERE md >= 5) "
            "SELECT node AS item, CAST(count(*) AS BIGINT) "
            "AS core_degree FROM fs GROUP BY 1 ORDER BY 1"),
        "mutual_nn": (
            "WITH scored AS (SELECT a.vec_id AS s, b.vec_id AS t, "
            "list_cosine_similarity(a.embedding, b.embedding) AS sc "
            "FROM embeddings a JOIN embeddings b "
            "ON a.vec_id <> b.vec_id), "
            "top1 AS (SELECT s, t FROM (SELECT s, t, row_number() "
            "OVER (PARTITION BY s ORDER BY sc DESC, t) AS rn "
            "FROM scored) WHERE rn = 1) "
            "SELECT x.s AS vec_a, x.t AS vec_b FROM top1 x "
            "JOIN top1 y ON x.s = y.t AND x.t = y.s AND x.s < x.t "
            "ORDER BY 1, 2"),
        "monthly_seasonality": (
            "WITH m AS (SELECT CAST(year(o_orderdate) * 12 "
            "+ month(o_orderdate) - 1 AS BIGINT) AS month_bucket, "
            "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) "
            "AS BIGINT) AS rev_c FROM orders GROUP BY 1), "
            "w AS (SELECT month_bucket, rev_c, "
            "CAST(sum(rev_c) OVER win AS BIGINT) AS s, "
            "CAST(count(*) OVER win AS BIGINT) AS c FROM m "
            "WINDOW win AS (ORDER BY month_bucket "
            "ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)) "
            "SELECT month_bucket, rev_c, (2 * s + 12) // 24 AS ma12_c, "
            "(1000000 * rev_c) // ((2 * s + 12) // 24) AS index_ppm "
            "FROM w WHERE c = 12 ORDER BY month_bucket"),
        "assoc_triples": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "tri AS (SELECT a.item AS item_a, b.item AS item_b, "
            "c.item AS item_c, CAST(count(*) AS BIGINT) AS n_users "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.item < b.item JOIN ui c "
            "ON a.user_id = c.user_id AND b.item < c.item "
            "GROUP BY 1, 2, 3) "
            "SELECT item_a, item_b, item_c, n_users FROM tri "
            "ORDER BY n_users DESC, item_a, item_b, item_c LIMIT 30"),
        "jaccard_histogram": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            ngrams AS (
              SELECT DISTINCT doc_id, ng FROM (
                SELECT doc_id,
                       unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                               for i in range(1, greatest(len(ws) - 1, 1))])
                       AS ng
                FROM toks)),
            df AS (SELECT ng, count(*) AS c FROM ngrams GROUP BY ng),
            surv AS (SELECT n.doc_id, n.ng FROM ngrams n
                     JOIN df USING (ng) WHERE df.c <= 32),
            sizes AS (SELECT doc_id, count(*) AS sz FROM surv
                      GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS left_id, b.doc_id AS right_id,
                     count(*) AS n_common
              FROM surv a JOIN surv b
                ON a.ng = b.ng AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            scored AS (
              SELECT round(i.n_common / (sa.sz + sb.sz - i.n_common), 6)
                       AS j
              FROM inter i JOIN sizes sa ON sa.doc_id = i.left_id
                           JOIN sizes sb ON sb.doc_id = i.right_id
              WHERE i.n_common / (sa.sz + sb.sz - i.n_common) >= 0.1)
            SELECT CAST(floor(j * 10) AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n_pairs
            FROM scored GROUP BY 1 ORDER BY 1""",
        "survival_km": (
            "WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t "
            "FROM events), "
            "fv AS (SELECT user_id, min(t) AS tv FROM e "
            "WHERE event_type = 'view' GROUP BY 1), "
            "fp AS (SELECT e.user_id, min(e.t) AS tp FROM e "
            "JOIN fv USING (user_id) WHERE e.event_type = 'purchase' "
            "AND e.t >= fv.tv GROUP BY 1), "
            "le AS (SELECT user_id, max(t) AS tl FROM e GROUP BY 1), "
            "du AS (SELECT fv.user_id, CASE WHEN fp.tp IS NOT NULL "
            "THEN (fp.tp - fv.tv) // 86400000000 "
            "ELSE (le.tl - fv.tv) // 86400000000 END AS d, "
            "CASE WHEN fp.tp IS NOT NULL THEN 1 ELSE 0 END AS ev "
            "FROM fv JOIN le USING (user_id) "
            "LEFT JOIN fp ON fp.user_id = fv.user_id), "
            "evt AS (SELECT d AS t_days, CAST(sum(ev) AS BIGINT) "
            "AS n_events FROM du GROUP BY 1 HAVING sum(ev) > 0), "
            "risk AS (SELECT t_days, n_events, "
            "(SELECT CAST(count(*) AS BIGINT) FROM du "
            "WHERE du.d >= evt.t_days) AS n_risk FROM evt), "
            "term AS (SELECT t_days, n_risk, n_events, "
            "CASE WHEN n_events = n_risk THEN -1000000000000000 "
            "ELSE CAST(floor(ln(1.0 - CAST(n_events AS DOUBLE) "
            "/ n_risk) * 1000000000 + 0.5) AS BIGINT) END AS trm "
            "FROM risk) "
            "SELECT t_days, n_risk, n_events, "
            "CAST(sum(trm) OVER (ORDER BY t_days) AS BIGINT) "
            "AS log_surv_nano FROM term ORDER BY t_days"),
        "late_events": (
            "WITH o AS (SELECT event_id, epoch_us(ts) AS t "
            "FROM events), "
            "w AS (SELECT event_id, t, max(t) OVER (ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm "
            "FROM o) "
            "SELECT t // 86400000000 AS day, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(count(*) FILTER (WHERE wm IS NOT NULL "
            "AND t < wm - 3600000000) AS BIGINT) AS n_late "
            "FROM w GROUP BY 1 ORDER BY 1"),
        "ndcg_eval": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            q AS (SELECT unnest(['batch', 'hash', 'scan']) AS term),
            stats AS (SELECT count(*) AS n, avg(len(ws)) AS avgdl
                      FROM toks),
            tf AS (SELECT t.doc_id, w.word AS term,
                          CAST(count(*) AS BIGINT) AS tf,
                          any_value(len(t.ws)) AS dl
                   FROM toks t, unnest(t.ws) AS w(word)
                   WHERE w.word IN (SELECT term FROM q)
                   GROUP BY t.doc_id, w.word),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM tf GROUP BY term),
            scored AS (
              SELECT tf.doc_id,
                     sum(ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5))
                         * (tf.tf * (1.2 + 1.0))
                         / (tf.tf + 1.2 * (1.0 - 0.75
                                           + 0.75 * tf.dl / s.avgdl)))
                       AS raw
              FROM tf JOIN df USING (term), stats s
              GROUP BY tf.doc_id),
            r AS (SELECT doc_id, row_number() OVER (
                    ORDER BY floor(raw * 1e6 + 0.5) / 1e6 DESC, doc_id)
                    AS rnk
                  FROM scored ORDER BY rnk LIMIT 20),
            gold AS (SELECT doc_id FROM toks
                     WHERE list_contains(ws, 'batch')
                       AND list_contains(ws, 'hash')
                       AND list_contains(ws, 'scan')),
            ng AS (SELECT CAST(count(*) AS BIGINT) AS n_gold FROM gold),
            dcg AS (SELECT CAST(coalesce(sum(CAST(floor(
                      1000000000.0 / log2(rnk + 1.0) + 0.5)
                      AS BIGINT)), 0) AS BIGINT) AS dcg_nano
                    FROM r WHERE doc_id IN (SELECT doc_id FROM gold)),
            idcg AS (SELECT CAST(sum(CAST(floor(
                       1000000000.0 / log2(i + 1.0) + 0.5)
                       AS BIGINT)) AS BIGINT) AS idcg_nano
                     FROM range(1, 21) t(i)
                     WHERE i <= (SELECT least(20, n_gold) FROM ng))
            SELECT n_gold, dcg_nano, idcg_nano,
                   (1000000 * dcg_nano) // idcg_nano AS ndcg_ppm
            FROM ng, dcg, idcg""",
        "nucleus_vocab": r"""
            WITH toks AS (
              SELECT lang,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            words AS (SELECT lang, unnest(ws) AS term FROM toks),
            tc AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS c
                   FROM words GROUP BY 1, 2),
            r AS (SELECT lang, term, c,
                    CAST(sum(c) OVER (PARTITION BY lang
                         ORDER BY c DESC, term) AS BIGINT) AS cum,
                    row_number() OVER (PARTITION BY lang
                         ORDER BY c DESC, term) AS rn,
                    CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT)
                      AS total,
                    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT)
                      AS vs
                  FROM tc),
            k AS (SELECT lang, any_value(vs) AS vocab_size,
                         CAST(min(rn) AS BIGINT) AS nucleus_terms,
                         any_value(total) AS total_mass
                  FROM r WHERE 2 * cum >= total GROUP BY 1)
            SELECT k.lang, k.vocab_size, k.nucleus_terms,
                   r.cum AS nucleus_mass, k.total_mass
            FROM k JOIN r ON r.lang = k.lang AND r.rn = k.nucleus_terms
            ORDER BY k.lang""",
        "phrase_search": (
            r"SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            r"CAST(count(*) FILTER (WHERE regexp_matches(lower(text), "
            r"'(?:^|\s)batch\s+hash(?:\s|$)')) AS BIGINT) AS n_match "
            r"FROM documents GROUP BY 1 ORDER BY 1"),
        "title_entity_clusters": r"""
            WITH RECURSIVE t AS (
              SELECT DISTINCT lower(substr(text, 1, 12)) AS title
              FROM documents WHERE text IS NOT NULL),
            d AS (SELECT title FROM t WHERE title <> ''),
            e AS (SELECT a.title AS l, b.title AS r
                  FROM d a JOIN d b ON a.title < b.title
                  WHERE levenshtein(a.title, b.title) = 1),
            lab AS (
              SELECT node, node AS label FROM
                (SELECT l AS node FROM e UNION SELECT r FROM e)
              UNION ALL
              SELECT node, label FROM (
                WITH cur AS (SELECT node, label FROM lab),
                prop AS (
                  SELECT node, label FROM cur
                  UNION ALL SELECT e.r, cur.label FROM e
                            JOIN cur ON cur.node = e.l
                  UNION ALL SELECT e.l, cur.label FROM e
                            JOIN cur ON cur.node = e.r),
                nl AS (SELECT node, min(label) AS label FROM prop
                       GROUP BY 1)
                SELECT nl.node, nl.label FROM nl
                WHERE EXISTS (SELECT 1 FROM nl n2
                              JOIN cur c ON c.node = n2.node
                              WHERE n2.label < c.label))),
            fin AS (SELECT node, min(label) AS label FROM lab
                    GROUP BY 1)
            SELECT label AS canonical_title,
                   CAST(count(*) AS BIGINT) AS n_members
            FROM fin GROUP BY 1 ORDER BY 1""",
        "popularity_hitrate": (
            "WITH e AS (SELECT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item, "
            "epoch_us(ts) // 86400000000 AS day, event_type "
            "FROM events WHERE event_type IN ('view', 'purchase')), "
            "tv AS (SELECT DISTINCT user_id, item FROM e "
            "WHERE event_type = 'view' AND day < 19743), "
            "pop AS (SELECT item, count(*) AS n FROM tv GROUP BY 1 "
            "ORDER BY n DESC, item LIMIT 20), "
            "ranked AS (SELECT item, row_number() OVER "
            "(ORDER BY n DESC, item) AS rnk FROM pop), "
            "gold AS (SELECT DISTINCT user_id, item FROM e "
            "WHERE event_type = 'purchase' AND day >= 19743), "
            "gu AS (SELECT DISTINCT user_id FROM gold), "
            "recs AS (SELECT gu.user_id, r.item, row_number() OVER "
            "(PARTITION BY gu.user_id ORDER BY r.rnk) AS k "
            "FROM gu CROSS JOIN ranked r "
            "WHERE NOT EXISTS (SELECT 1 FROM tv "
            "WHERE tv.user_id = gu.user_id AND tv.item = r.item)), "
            "hit AS (SELECT gu.user_id, "
            "max(CASE WHEN g.item IS NOT NULL THEN 1 ELSE 0 END) AS h "
            "FROM gu LEFT JOIN (SELECT user_id, item FROM recs "
            "WHERE k <= 3) rr ON rr.user_id = gu.user_id "
            "LEFT JOIN gold g ON g.user_id = rr.user_id "
            "AND g.item = rr.item GROUP BY 1) "
            "SELECT CAST(count(*) AS BIGINT) AS n_users, "
            "CAST(sum(h) AS BIGINT) AS n_hits, "
            "(1000000 * CAST(sum(h) AS BIGINT)) // count(*) "
            "AS hitrate_ppm FROM hit"),
        "ht_estimate": (
            "WITH w AS (SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) "
            "AS n_tokens, least(CAST(len(regexp_extract_all(text, "
            "'\\S+')) AS BIGINT) * 5000, 1000000) AS w_ppm "
            "FROM documents), "
            "s AS (SELECT * FROM w WHERE CAST(concat('0x', "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) "
            "% 1000000 < w_ppm), "
            "t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM w), "
            "h AS (SELECT CAST(count(*) AS BIGINT) AS n_sampled, "
            "CAST(sum((n_tokens * 1000000) // w_ppm) AS BIGINT) "
            "AS ht FROM s) "
            "SELECT h.n_sampled, h.ht AS ht_total_tokens, "
            "t.tt AS true_total_tokens, "
            "(1000000 * abs(h.ht - t.tt)) // t.tt AS err_ppm "
            "FROM h, t"),
        "bootstrap_ci": (
            "WITH reps AS (SELECT i AS rep FROM range(0, 20) t(i)), "
            "w AS (SELECT d.lang, d.n_chars, r.rep, "
            "(CAST(CAST(concat('0x', substr(md5(concat(CAST(d.doc_id "
            "AS VARCHAR), ':boot:', CAST(r.rep AS VARCHAR))), 1, 8)) "
            "AS UBIGINT) AS DOUBLE) + 0.5) / 4294967296.0 AS u "
            "FROM documents d CROSS JOIN reps r), "
            "ww AS (SELECT lang, rep, n_chars, "
            "CASE WHEN u < 0.36787944117144233 THEN 0 "
            "WHEN u < 0.7357588823428847 THEN 1 "
            "WHEN u < 0.9196986029286058 THEN 2 "
            "WHEN u < 0.9810118431238462 THEN 3 "
            "WHEN u < 0.9963401531726563 THEN 4 "
            "WHEN u < 0.9994058151824183 THEN 5 "
            "WHEN u < 0.9999167588507119 THEN 6 "
            "ELSE 7 END AS wt FROM w), "
            "est AS (SELECT lang, rep, "
            "(1000000 * CAST(sum(wt * n_chars) AS BIGINT)) "
            "// CAST(sum(wt) AS BIGINT) AS est FROM ww GROUP BY 1, 2) "
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_reps, "
            "CAST(quantile_disc(est, 0.1) AS BIGINT) AS lo_micro, "
            "CAST(quantile_disc(est, 0.9) AS BIGINT) AS hi_micro "
            "FROM est GROUP BY 1 ORDER BY 1"),
        "index_compression": r"""
            WITH posts AS (
              SELECT DISTINCT unnest(list_filter(
                       regexp_split_to_array(lower(text), '\s+'),
                       w -> w <> '')) AS term, doc_id
              FROM documents),
            df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                   FROM posts GROUP BY 1),
            top AS (SELECT term FROM df
                    ORDER BY df DESC, term LIMIT 20),
            gaps AS (SELECT p.term,
                       CASE WHEN lag(p.doc_id) OVER w IS NULL
                            THEN p.doc_id + 1
                            ELSE p.doc_id - lag(p.doc_id) OVER w
                       END AS g
                     FROM posts p JOIN top USING (term)
                     WINDOW w AS (PARTITION BY p.term
                                  ORDER BY p.doc_id)),
            bits AS (SELECT term,
                       CAST(count(*) AS BIGINT) AS n_postings,
                       CAST(sum(2 * (length(printf('%b', g)) - 1) + 1)
                            AS BIGINT) AS gamma_bits
                     FROM gaps GROUP BY 1)
            SELECT term, n_postings, gamma_bits,
                   64 * n_postings AS raw_bits,
                   (1000000 * gamma_bits) // (64 * n_postings)
                     AS ratio_ppm
            FROM bits ORDER BY term""",
        "hll_twin": (
            "WITH du AS (SELECT DISTINCT event_type, user_id "
            "FROM events), "
            "s1 AS (SELECT event_type, CAST((CAST(user_id AS HUGEINT) "
            "+ 11400714819323198485) % 18446744073709551616 "
            "AS UBIGINT) AS x FROM du), "
            "x1 AS (SELECT event_type, xor(x, x >> 30) AS x FROM s1), "
            "m1 AS (SELECT event_type, CAST((CAST(x AS HUGEINT) "
            "* 484763065 + ((CAST(x % 4294967296 AS HUGEINT) "
            "* 3210233709) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS UBIGINT) AS x FROM x1), "
            "x2 AS (SELECT event_type, xor(x, x >> 27) AS x FROM m1), "
            "m2 AS (SELECT event_type, CAST((CAST(x AS HUGEINT) "
            "* 321982955 + ((CAST(x % 4294967296 AS HUGEINT) "
            "* 2496678331) % 4294967296) * 4294967296) "
            "% 18446744073709551616 AS UBIGINT) AS x FROM x2), "
            "h AS (SELECT event_type, xor(x, x >> 31) AS h FROM m2), "
            "rk AS (SELECT event_type, CAST(h >> 52 AS BIGINT) "
            "AS bucket, CASE WHEN h % 4503599627370496 = 0 THEN 53 "
            "ELSE 53 - length(printf('%b', "
            "CAST(h % 4503599627370496 AS BIGINT))) END AS rnk "
            "FROM h), "
            "regs AS (SELECT event_type, bucket, max(rnk) AS rnk "
            "FROM rk GROUP BY 1, 2), "
            "agg AS (SELECT event_type, CAST(count(*) AS BIGINT) "
            "AS nz, sum(CAST(power(2, 53 - rnk) AS HUGEINT)) AS s_nz "
            "FROM regs GROUP BY 1), "
            "ex AS (SELECT event_type, CAST(count(DISTINCT user_id) "
            "AS BIGINT) AS n_exact FROM events GROUP BY 1), "
            "fin AS (SELECT event_type, nz, 4096 - nz AS zeros, "
            "(0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0 "
            "/ (CAST(s_nz + (4096 - nz) * CAST(9007199254740992 "
            "AS HUGEINT) AS DOUBLE) / 9007199254740992.0) AS e "
            "FROM agg), "
            "o AS (SELECT f.event_type, x.n_exact, f.nz "
            "AS nonzero_regs, CAST(floor(CASE WHEN f.e <= 2.5 "
            "* 4096.0 AND f.zeros > 0 THEN 4096.0 * ln(4096.0 "
            "/ CAST(f.zeros AS DOUBLE)) ELSE f.e END) AS BIGINT) "
            "AS hll_estimate FROM fin f JOIN ex x USING (event_type)) "
            "SELECT event_type, n_exact, nonzero_regs, hll_estimate, "
            "(1000000 * abs(hll_estimate - n_exact)) // n_exact "
            "AS err_ppm FROM o ORDER BY event_type"),
        "cdc_chunks": (
            "WITH pos AS (SELECT doc_id, len(text) AS L, "
            "unnest([i for i in range(0, len(text))]) AS i, "
            "unnest([CAST(ord(substr(text, i + 1, 1)) AS BIGINT) "
            "for i in range(0, len(text))]) AS c FROM documents), "
            "w AS (SELECT doc_id, i, L, (c "
            "+ coalesce(lag(c, 1) OVER win, 0) * 257 "
            "+ coalesce(lag(c, 2) OVER win, 0) * 66049 "
            "+ coalesce(lag(c, 3) OVER win, 0) * 16974593 "
            "+ coalesce(lag(c, 4) OVER win, 0) * 67503107 "
            "+ coalesce(lag(c, 5) OVER win, 0) * 168429323 "
            "+ coalesce(lag(c, 6) OVER win, 0) * 336663071 "
            "+ coalesce(lag(c, 7) OVER win, 0) * 623063367) "
            "% 2147483647 AS h FROM pos "
            "WINDOW win AS (PARTITION BY doc_id ORDER BY i)), "
            "b AS (SELECT doc_id, CAST(count(*) FILTER "
            "(WHERE h % 64 = 0 AND i >= 7 AND i <= L - 2) AS BIGINT) "
            "AS nb FROM w GROUP BY doc_id) "
            "SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars, "
            "coalesce(b.nb, 0) + 1 AS n_chunks FROM documents d "
            "LEFT JOIN b ON b.doc_id = d.doc_id ORDER BY 1"),
        "lang_cross_entropy": (
            "WITH bg AS (SELECT lang, unnest([substr(lower(text), i, "
            "2) for i in range(1, len(text))]) AS bg "
            "FROM documents), "
            "c AS (SELECT lang, bg, CAST(count(*) AS BIGINT) AS c "
            "FROM bg GROUP BY 1, 2), "
            "v AS (SELECT CAST(count(DISTINCT bg) AS BIGINT) AS v "
            "FROM c), "
            "t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS t FROM c "
            "GROUP BY 1), "
            "langs AS (SELECT DISTINCT lang FROM c), "
            "contrib AS (SELECT ce.lang AS eval_lang, tr.lang "
            "AS train_lang, ce.c AS ec, CAST(floor(ln(CAST("
            "coalesce(ct.c, 0) + 1 AS DOUBLE) / (tt.t + v.v)) "
            "* 1000000000 + 0.5) AS BIGINT) AS lp "
            "FROM c ce CROSS JOIN langs tr "
            "JOIN t tt ON tt.lang = tr.lang CROSS JOIN v "
            "LEFT JOIN c ct ON ct.lang = tr.lang AND ct.bg = ce.bg), "
            "agg AS (SELECT eval_lang, train_lang, "
            "CAST(-sum(ec * lp) AS BIGINT) AS tot FROM contrib "
            "GROUP BY 1, 2) "
            "SELECT a.eval_lang, a.train_lang, "
            "a.tot // te.t AS ce_nano_per_char FROM agg a "
            "JOIN t te ON te.lang = a.eval_lang ORDER BY 1, 2"),
        "zipf_slope": r"""
            WITH w AS (SELECT unnest(list_filter(
                         regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '')) AS term FROM documents),
            tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c
                   FROM w GROUP BY 1 ORDER BY c DESC, term LIMIT 100),
            r AS (SELECT CAST(floor(ln(CAST(row_number() OVER (
                    ORDER BY c DESC, term) AS DOUBLE)) * 1000000000
                    + 0.5) AS BIGINT) AS x,
                  CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000
                    + 0.5) AS BIGINT) AS y
                  FROM tc),
            s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
                  CAST(sum(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
                  sum(CAST(x AS HUGEINT) * x) AS sxx,
                  sum(CAST(x AS HUGEINT) * y) AS sxy FROM r)
            SELECT n AS n_terms,
                   CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * sxx - sx * sx AS DOUBLE) AS zipf_slope
            FROM s""",
        "burst_viterbi": (
            "WITH RECURSIVE e AS (SELECT user_id, epoch_us(ts) AS t, "
            "event_id FROM events), "
            "g AS (SELECT user_id, "
            "CAST(floor(((1.0 / 3600.0) * (CAST(gap AS DOUBLE) "
            "/ 1000000.0) - ln(1.0 / 3600.0)) * 1000000000.0 + 0.5) "
            "AS BIGINT) AS costl, "
            "CAST(floor(((4.0 / 3600.0) * (CAST(gap AS DOUBLE) "
            "/ 1000000.0) - ln(4.0 / 3600.0)) * 1000000000.0 + 0.5) "
            "AS BIGINT) AS costh, "
            "row_number() OVER (PARTITION BY user_id ORDER BY rn) "
            "AS i FROM (SELECT user_id, gap, row_number() OVER "
            "(PARTITION BY user_id ORDER BY t, event_id) AS rn "
            "FROM (SELECT user_id, t, event_id, t - lag(t) OVER "
            "(PARTITION BY user_id ORDER BY t, event_id) AS gap "
            "FROM e) WHERE gap IS NOT NULL)), "
            "dp AS (SELECT user_id, i, costl AS cl, "
            "CAST(0 AS BIGINT) AS nl, costh AS ch, "
            "CAST(1 AS BIGINT) AS nh FROM g WHERE i = 1 "
            "UNION ALL "
            "SELECT d.user_id, g.i, "
            "g.costl + CASE WHEN d.cl <= d.ch + 1000000000 THEN d.cl "
            "ELSE d.ch + 1000000000 END, "
            "CASE WHEN d.cl <= d.ch + 1000000000 THEN d.nl "
            "ELSE d.nh END, "
            "g.costh + CASE WHEN d.ch <= d.cl + 1000000000 THEN d.ch "
            "ELSE d.cl + 1000000000 END, "
            "CASE WHEN d.ch <= d.cl + 1000000000 THEN d.nh "
            "ELSE d.nl END + 1 "
            "FROM dp d JOIN g ON g.user_id = d.user_id "
            "AND g.i = d.i + 1), "
            "fin AS (SELECT user_id, max(i) AS mi FROM dp GROUP BY 1) "
            "SELECT d.user_id, d.i AS n_gaps, "
            "CASE WHEN d.cl <= d.ch THEN d.cl ELSE d.ch END "
            "AS cost_nano, "
            "CASE WHEN d.cl <= d.ch THEN d.nl ELSE d.nh END "
            "AS n_high FROM dp d JOIN fin ON fin.user_id = d.user_id "
            "AND fin.mi = d.i ORDER BY d.user_id"),
        "audio_metadata": (
            "WITH r AS (SELECT doc_id, 'https://media.example/' || "
            "doc_id || '/audio-0.wav' AS media_ref FROM documents), "
            "d AS (SELECT doc_id, media_ref, 200 + "
            "CAST(concat('0x', substr(md5(media_ref), 5, 2)) "
            "AS INTEGER) * 7 AS dur_ms FROM r) "
            "SELECT doc_id, media_ref, CAST(8000 AS BIGINT) "
            "AS rate_hz, CAST(1 AS BIGINT) AS channels, "
            "CAST(2 AS BIGINT) AS sample_bytes, "
            "CAST(8 * dur_ms AS BIGINT) AS n_frames, "
            "CAST((8 * dur_ms) * 1000 // 8000 AS BIGINT) "
            "AS duration_ms FROM d ORDER BY doc_id"),
        "item_cheapest_path": (
            "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "prs AS (SELECT a.item AS ia, b.item AS ib, "
            "CAST(count(*) AS BIGINT) AS n FROM ui a JOIN ui b "
            "ON a.user_id = b.user_id AND a.item < b.item "
            "GROUP BY 1, 2), "
            "edges AS (SELECT ia, ib, 1000000 // n AS w FROM prs "
            "WHERE n >= 2), "
            "adj AS (SELECT ia AS node, ib AS nbr, w FROM edges "
            "UNION ALL SELECT ib, ia, w FROM edges), "
            "d AS (SELECT (SELECT min(node) FROM adj) AS node, "
            "CAST(0 AS BIGINT) AS cost "
            "UNION ALL "
            "SELECT node, cost FROM ("
            "WITH cur AS (SELECT node, cost FROM d), "
            "relax AS (SELECT a.nbr AS node, c.cost + a.w AS cost "
            "FROM cur c JOIN adj a ON a.node = c.node "
            "UNION ALL SELECT node, cost FROM cur), "
            "nd AS (SELECT node, min(cost) AS cost FROM relax "
            "GROUP BY 1) "
            "SELECT nd.node, nd.cost FROM nd "
            "WHERE EXISTS (SELECT 1 FROM nd n2 LEFT JOIN cur c "
            "ON c.node = n2.node WHERE c.node IS NULL "
            "OR n2.cost < c.cost))) "
            "SELECT node AS item, CAST(min(cost) AS BIGINT) AS cost "
            "FROM d GROUP BY 1 ORDER BY 1"),
        "edge_churn": (
            "WITH ui AS (SELECT DISTINCT user_id, "
            "epoch_us(ts) // 604800000000 AS week, "
            "CAST(json_extract(props, '$.k') AS BIGINT) AS item "
            "FROM events WHERE event_type = 'view'), "
            "e AS (SELECT DISTINCT a.week, a.item AS ia, b.item AS ib "
            "FROM ui a JOIN ui b ON a.user_id = b.user_id "
            "AND a.week = b.week AND a.item < b.item), "
            "wc AS (SELECT week, CAST(count(*) AS BIGINT) AS n "
            "FROM e GROUP BY 1), "
            "cons AS (SELECT w1.week AS week_a, w2.week AS week_b, "
            "w1.n AS n_a, w2.n AS n_b FROM wc w1 "
            "JOIN wc w2 ON w2.week = w1.week + 1), "
            "inter AS (SELECT c.week_a, CAST(count(*) AS BIGINT) "
            "AS n_common FROM cons c JOIN e e1 "
            "ON e1.week = c.week_a JOIN e e2 ON e2.week = c.week_b "
            "AND e2.ia = e1.ia AND e2.ib = e1.ib GROUP BY 1) "
            "SELECT c.week_a, c.week_b, c.n_a, c.n_b, i.n_common, "
            "(1000000 * i.n_common) // (c.n_a + c.n_b - i.n_common) "
            "AS jaccard_ppm FROM cons c "
            "JOIN inter i ON i.week_a = c.week_a "
            "ORDER BY c.week_a"),
        "l_diversity": (
            "WITH c AS (SELECT CAST(c_nationkey AS BIGINT) "
            "AS c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) "
            "AS c FROM customer GROUP BY 1, 2) "
            "SELECT c_nationkey, CAST(sum(c) AS BIGINT) "
            "AS n_customers, CAST(count(*) AS BIGINT) AS l_distinct, "
            "CAST(floor((ln(sum(c)) - sum(CAST(floor(c * ln(c) "
            "* 1000000000 + 0.5) AS BIGINT)) / 1000000000.0 "
            "/ sum(c)) * 1000000000 + 0.5) AS BIGINT) "
            "AS entropy_nano FROM c GROUP BY 1 ORDER BY 1"),
        "apportion_sample": (
            "WITH cell AS (SELECT lang, source, "
            "CAST(count(*) AS BIGINT) AS n_docs "
            "FROM documents GROUP BY 1, 2), "
            "tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t "
            "FROM cell), "
            "q AS (SELECT lang, source, n_docs, "
            "(1000 * n_docs) // t AS base, "
            "(1000 * n_docs) % t AS rem FROM cell, tot), "
            "lft AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS l "
            "FROM q), "
            "r AS (SELECT *, row_number() OVER "
            "(ORDER BY rem DESC, lang, source) AS rk FROM q) "
            "SELECT lang, source, n_docs, CAST(base + CASE WHEN "
            "rk <= (SELECT l FROM lft) THEN 1 ELSE 0 END AS BIGINT) "
            "AS seats FROM r ORDER BY lang, source"),
        "sq8_topk": (
            _SQ8_CODES_SQL +
            ", codes AS (SELECT vec_id, ex.dim, "
            "CAST(floor(mn * 16777216.0 + 0.5) AS BIGINT) "
            "+ (CASE WHEN mx = mn THEN 0 ELSE "
            "CAST(floor((val - mn) * 255.0 / (mx - mn)) AS BIGINT) END) "
            "* CAST(floor((mx - mn) / 255.0 * 16777216.0 + 0.5) "
            "AS BIGINT) AS xf FROM ex JOIN grid ON grid.dim = ex.dim), "
            "q AS (SELECT vec_id AS query_id, dim, xf FROM codes "
            "WHERE vec_id IN (SELECT vec_id FROM embeddings "
            "ORDER BY vec_id LIMIT 5)), "
            "scored AS (SELECT q.query_id, c.vec_id AS neighbor_id, "
            "CAST(sum(q.xf * c.xf) AS BIGINT) AS iscore "
            "FROM q JOIN codes c ON c.dim = q.dim GROUP BY 1, 2), "
            "ranked AS (SELECT query_id, neighbor_id, iscore, "
            "row_number() OVER (PARTITION BY query_id "
            "ORDER BY iscore DESC, neighbor_id) AS rank FROM scored) "
            "SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, "
            "iscore FROM ranked WHERE rank <= 10 ORDER BY query_id, rank"),
        "kcenter_sample": _kcenter_oracle(8),
        "dict_encoding": (
            " UNION ALL ".join(
                "SELECT '{tab}.{col}' AS col, n_rows, n_distinct, "
                "plain_bytes, dict_data + (n_rows * bits + 7) // 8 "
                "AS dict_bytes FROM (SELECT "
                "CAST(sum(c) AS BIGINT) AS n_rows, "
                "CAST(count(*) AS BIGINT) AS n_distinct, "
                "CAST(sum(c * strlen(v)) AS BIGINT) "
                "AS plain_bytes, "
                "CAST(sum(strlen(v)) AS BIGINT) AS dict_data, "
                "CASE WHEN count(*) <= 1 THEN 0 ELSE "
                "length(printf('%b', count(*) - 1)) END AS bits "
                "FROM (SELECT {col} AS v, CAST(count(*) AS BIGINT) "
                "AS c FROM {tab} GROUP BY 1))".format(tab=t, col=c)
                for t, c in [("documents", "lang"),
                             ("documents", "source"),
                             ("events", "event_type"),
                             ("customer", "c_mktsegment"),
                             ("orders", "o_orderpriority")])
            + " ORDER BY col"),
        "t_closeness": (
            "WITH cell AS (SELECT CAST(c_nationkey AS BIGINT) AS nat, "
            "c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS c "
            "FROM customer GROUP BY 1, 2), "
            "segs AS (SELECT DISTINCT seg FROM cell), "
            "nats AS (SELECT nat, CAST(sum(c) AS BIGINT) AS ng "
            "FROM cell GROUP BY 1), "
            "gl AS (SELECT seg, CAST(sum(c) AS BIGINT) AS cg "
            "FROM cell GROUP BY 1), "
            "tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, "
            "CAST(count(DISTINCT seg) AS BIGINT) AS k FROM cell), "
            "grid AS (SELECT nats.nat, nats.ng, segs.seg, "
            "COALESCE(cell.c, 0) AS c, gl.cg, tot.n, tot.k "
            "FROM nats CROSS JOIN segs "
            "LEFT JOIN cell ON cell.nat = nats.nat "
            "AND cell.seg = segs.seg "
            "JOIN gl ON gl.seg = segs.seg CROSS JOIN tot), "
            "cum AS (SELECT nat, ng, n, k, CAST(sum(c * n - cg * ng) "
            "OVER (PARTITION BY nat ORDER BY seg) AS HUGEINT) AS d "
            "FROM grid) "
            "SELECT nat AS c_nationkey, CAST(max(ng) AS BIGINT) "
            "AS n_customers, CAST(sum(abs(d)) * 1000000000 "
            "// (max(ng) * max(n) * (max(k) - 1)) AS BIGINT) "
            "AS emd_nano FROM cum GROUP BY 1 ORDER BY 1"),
        "mannwhitney": (
            "WITH j AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) "
            "AS BIGINT) AS v, CASE WHEN c_mktsegment = 'BUILDING' "
            "THEN 1 ELSE 0 END AS g FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')), "
            "cell AS (SELECT v, CAST(sum(g) AS BIGINT) AS n1c, "
            "CAST(count(*) AS BIGINT) AS t FROM j GROUP BY 1), "
            "sc AS (SELECT *, CAST(COALESCE(sum(t) OVER (ORDER BY v "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            "AS BIGINT) AS cb FROM cell), "
            "a AS (SELECT CAST(sum(n1c * (2 * cb + t + 1)) AS HUGEINT) "
            "AS r12, CAST(sum(n1c) AS HUGEINT) AS n1, "
            "CAST(sum(t - n1c) AS HUGEINT) AS n2, "
            "CAST(sum(t * t * t - t) AS HUGEINT) AS tie FROM sc) "
            "SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2, "
            "CAST(r12 - n1 * (n1 + 1) AS BIGINT) AS u2, "
            "CAST(floor((CAST(r12 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE) "
            "/ 2.0) / sqrt(CAST(n1 * n2 * ((n1 + n2) * (n1 + n2) "
            "* (n1 + n2) - (n1 + n2) - tie) AS DOUBLE) "
            "/ CAST(12 * (n1 + n2) * (n1 + n2 - 1) AS DOUBLE)) "
            "* 1000000000 + 0.5) AS BIGINT) AS z_nano FROM a"),
        "dup_spans": ("""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 w -> w <> '') AS ws
              FROM documents),
            occ AS (
              SELECT doc_id, CAST(u['pos'] AS BIGINT) AS pos,
                     CAST(u['ng'] AS VARCHAR) AS ng FROM (
                SELECT doc_id,
                       unnest([{'pos': i - 1,
                                'ng': ws[i] || ' ' || ws[i+1] || ' ' ||
                                      ws[i+2] || ' ' || ws[i+3] || ' ' ||
                                      ws[i+4]}
                               for i in range(1, greatest(len(ws) - 3, 1))])
                       AS u
                FROM toks)),
            freq AS (SELECT ng FROM occ GROUP BY ng HAVING count(*) >= 2),
            dup AS (SELECT doc_id, pos FROM occ JOIN freq USING (ng)),
            steps AS (
              SELECT doc_id,
                     least(5, COALESCE(lead(pos) OVER (PARTITION BY doc_id
                           ORDER BY pos) - pos, 5)) AS step
              FROM dup),
            cov AS (SELECT doc_id, CAST(sum(step) AS BIGINT)
                           AS covered_tokens
                    FROM steps GROUP BY doc_id),
            tot AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens
                    FROM toks WHERE len(ws) > 0)
            SELECT t.doc_id, t.n_tokens,
                   COALESCE(c.covered_tokens, 0) AS covered_tokens,
                   round(COALESCE(c.covered_tokens, 0) * 1.0 / t.n_tokens,
                         6) AS dup_span_ratio
            FROM tot t LEFT JOIN cov c USING (doc_id)
            ORDER BY t.doc_id"""),
        "pca_power": _pca_power_oracle(),
        "random_walks": "WITH ui AS (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type = 'view'), pairs AS (SELECT a.item AS ia, b.item AS ib, count(*) AS cnt FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item GROUP BY 1, 2), edges AS (SELECT ia, ib FROM pairs WHERE cnt >= 2), sym AS (SELECT ia AS node, ib AS nbr FROM edges UNION ALL SELECT ib, ia FROM edges), adj AS MATERIALIZED (SELECT node, nbr, row_number() OVER (PARTITION BY node ORDER BY nbr) - 1 AS rnk, count(*) OVER (PARTITION BY node) AS deg FROM sym), w0 AS (SELECT DISTINCT node AS start, node AS cur FROM sym), w1 AS MATERIALIZED (SELECT w.start, a.nbr AS cur FROM w0 w JOIN adj a ON a.node = w.cur AND a.rnk = CAST(CAST(concat('0x', substr(md5(concat(CAST(w.start AS VARCHAR), ':walk:1:', CAST(w.cur AS VARCHAR))), 1, 8)) AS UBIGINT) % CAST(a.deg AS UBIGINT) AS BIGINT)), w2 AS MATERIALIZED (SELECT w.start, a.nbr AS cur FROM w1 w JOIN adj a ON a.node = w.cur AND a.rnk = CAST(CAST(concat('0x', substr(md5(concat(CAST(w.start AS VARCHAR), ':walk:2:', CAST(w.cur AS VARCHAR))), 1, 8)) AS UBIGINT) % CAST(a.deg AS UBIGINT) AS BIGINT)), w3 AS MATERIALIZED (SELECT w.start, a.nbr AS cur FROM w2 w JOIN adj a ON a.node = w.cur AND a.rnk = CAST(CAST(concat('0x', substr(md5(concat(CAST(w.start AS VARCHAR), ':walk:3:', CAST(w.cur AS VARCHAR))), 1, 8)) AS UBIGINT) % CAST(a.deg AS UBIGINT) AS BIGINT)) SELECT start, CAST(0 AS BIGINT) AS step, cur AS node FROM w0 UNION ALL SELECT start, 1, cur FROM w1 UNION ALL SELECT start, 2, cur FROM w2 UNION ALL SELECT start, 3, cur FROM w3 ORDER BY start, step",
        "negative_samples": "WITH pos AS (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type = 'purchase'), cat AS (SELECT item, row_number() OVER (ORDER BY item) - 1 AS idx FROM (SELECT DISTINCT CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type IN ('view', 'purchase'))), nc AS (SELECT count(*) AS n FROM cat), d AS (SELECT p.user_id, p.item, t.i AS r, CAST(CAST(concat('0x', substr(md5(concat(CAST(p.user_id AS VARCHAR), ':', CAST(p.item AS VARCHAR), ':neg:', CAST(t.i AS VARCHAR))), 1, 8)) AS UBIGINT) % (SELECT CAST(n AS UBIGINT) FROM nc) AS BIGINT) AS idx FROM pos p, range(4) t(i)), c AS (SELECT d.user_id, d.item, d.r, cat.item AS neg_item FROM d JOIN cat USING (idx)), ok AS (SELECT c.* FROM c WHERE NOT EXISTS (SELECT 1 FROM pos q WHERE q.user_id = c.user_id AND q.item = c.neg_item)), rk AS (SELECT user_id, item, neg_item, row_number() OVER (PARTITION BY user_id, item ORDER BY r) - 1 AS neg_rank FROM ok) SELECT user_id, item AS pos_item, CAST(neg_rank AS BIGINT) AS neg_rank, neg_item FROM rk WHERE neg_rank < 2 ORDER BY user_id, pos_item, neg_rank",
        "decayed_popularity": "WITH v AS (SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS item, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events WHERE event_type = 'view'), mt AS (SELECT max(sec) AS t FROM v), w AS (SELECT item, CAST(floor(exp(-CAST((SELECT t FROM mt) - sec AS DOUBLE) / 604800.0) * 1000000000 + 0.5) AS BIGINT) AS wn FROM v) SELECT item, CAST(count(*) AS BIGINT) AS n_views, CAST(sum(wn) AS BIGINT) AS decayed_nano FROM w GROUP BY item ORDER BY decayed_nano DESC, item LIMIT 10",
        "mst_coview": "WITH RECURSIVE ui AS MATERIALIZED (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type = 'view'), prs AS MATERIALIZED (SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS cnt FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item GROUP BY 1, 2 HAVING count(*) >= 2), nds AS MATERIALIZED (SELECT ia AS node FROM prs UNION SELECT ib FROM prs), kr(rnd, kind, node, lbl, ia, ib, cnt) AS (SELECT 0, 0, node, node, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT) FROM nds UNION ALL SELECT rnd, kind, node, lbl, ia, ib, cnt FROM (WITH cur AS (SELECT * FROM kr WHERE kind = 0), ce AS (SELECT e.ia, e.ib, e.cnt, la.lbl AS la, lb.lbl AS lb FROM prs e JOIN cur la ON la.node = e.ia JOIN cur lb ON lb.node = e.ib WHERE la.lbl <> lb.lbl), pick AS (SELECT * FROM ce ORDER BY cnt DESC, ia, ib LIMIT 1), nl AS (SELECT c.rnd + 1 AS rnd, 0 AS kind, c.node AS node, CASE WHEN c.lbl = greatest((SELECT la FROM pick), (SELECT lb FROM pick)) THEN least((SELECT la FROM pick), (SELECT lb FROM pick)) ELSE c.lbl END AS lbl, CAST(NULL AS BIGINT) AS ia, CAST(NULL AS BIGINT) AS ib, CAST(NULL AS BIGINT) AS cnt FROM cur c WHERE EXISTS (SELECT 1 FROM pick)), ed AS (SELECT (SELECT max(rnd) FROM cur) + 1 AS rnd, 1 AS kind, CAST(NULL AS BIGINT) AS node, CAST(NULL AS BIGINT) AS lbl, ia, ib, cnt FROM pick) SELECT * FROM nl UNION ALL SELECT * FROM ed)) SELECT ia, ib, cnt AS n_users FROM kr WHERE kind = 1 ORDER BY ia, ib",
        "textrank_keywords": _textrank_sql(),
        "label_propagation": 'WITH scored AS (SELECT a.vec_id AS s, b.vec_id AS t, list_cosine_similarity(a.embedding, b.embedding) AS sc FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), knn AS MATERIALIZED (SELECT s, t FROM (SELECT s, t, row_number() OVER (PARTITION BY s ORDER BY sc DESC, t) AS rn FROM scored) WHERE rn <= 5), l0 AS (SELECT vec_id, CASE WHEN vec_id % 5 = 0 THEN CAST(label AS BIGINT) ELSE -1 END AS lbl, CASE WHEN vec_id % 5 = 0 THEN 1 ELSE 0 END AS seed FROM embeddings), v1 AS (SELECT k.s AS vec_id, l.lbl, count(*) AS c FROM knn k JOIN l0 l ON l.vec_id = k.t WHERE l.lbl >= 0 GROUP BY 1, 2), p1 AS (SELECT vec_id, lbl FROM (SELECT vec_id, lbl, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, lbl) AS rn FROM v1) WHERE rn = 1), l1 AS MATERIALIZED (SELECT l.vec_id, CASE WHEN l.seed = 1 THEN l.lbl ELSE coalesce(p.lbl, -1) END AS lbl, l.seed FROM l0 l LEFT JOIN p1 p USING (vec_id)), v2 AS (SELECT k.s AS vec_id, l.lbl, count(*) AS c FROM knn k JOIN l1 l ON l.vec_id = k.t WHERE l.lbl >= 0 GROUP BY 1, 2), p2 AS (SELECT vec_id, lbl FROM (SELECT vec_id, lbl, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, lbl) AS rn FROM v2) WHERE rn = 1), l2 AS MATERIALIZED (SELECT l.vec_id, CASE WHEN l.seed = 1 THEN l.lbl ELSE coalesce(p.lbl, -1) END AS lbl, l.seed FROM l1 l LEFT JOIN p2 p USING (vec_id)), v3 AS (SELECT k.s AS vec_id, l.lbl, count(*) AS c FROM knn k JOIN l2 l ON l.vec_id = k.t WHERE l.lbl >= 0 GROUP BY 1, 2), p3 AS (SELECT vec_id, lbl FROM (SELECT vec_id, lbl, row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, lbl) AS rn FROM v3) WHERE rn = 1), l3 AS MATERIALIZED (SELECT l.vec_id, CASE WHEN l.seed = 1 THEN l.lbl ELSE coalesce(p.lbl, -1) END AS lbl, l.seed FROM l2 l LEFT JOIN p3 p USING (vec_id)) SELECT vec_id, lbl AS pred_label, CAST(seed AS BIGINT) AS is_seed FROM l3 ORDER BY vec_id',
        "hard_negatives": 'WITH scored AS (SELECT a.vec_id AS vec_id, b.vec_id AS neg_id, list_cosine_similarity(a.embedding, b.embedding) AS sc FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id AND a.label <> b.label) SELECT vec_id, CAST(rn - 1 AS BIGINT) AS neg_rank, neg_id FROM (SELECT vec_id, neg_id, row_number() OVER (PARTITION BY vec_id ORDER BY sc DESC, neg_id) AS rn FROM scored) WHERE rn <= 2 ORDER BY vec_id, neg_rank',
        "dedup_safe_folds": "WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents), c AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY hh) AS cluster_id FROM h) SELECT doc_id, cluster_id, CAST(CAST(concat('0x', substr(md5(concat(CAST(cluster_id AS VARCHAR), ':fold')), 1, 8)) AS UBIGINT) % 5 AS BIGINT) AS fold FROM c ORDER BY doc_id",
        "quantile_normalize": 'WITH g AS (SELECT n_chars, row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS gr FROM documents), s AS (SELECT doc_id, source, n_chars, row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) - 1 AS r, count(*) OVER (PARTITION BY source) AS ns, (SELECT count(*) FROM documents) AS n FROM documents), ix AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars, CASE WHEN ns = 1 THEN (n - 1) // 2 ELSE (r * (n - 1)) // (ns - 1) END AS idx FROM s) SELECT i.doc_id, i.source, i.n_chars, CAST(g.n_chars AS BIGINT) AS normalized_chars FROM ix i JOIN g ON g.gr = i.idx ORDER BY i.doc_id',
        "bpe_encode": (
            f"SELECT * "
            f"FROM read_parquet('{_fixture('sf0_01/bpe_encode.parquet')}')"),
        "hbos_outliers": 'WITH ex AS MATERIALIZED (SELECT vec_id, t.i AS d, CAST(embedding[CAST(t.i AS INTEGER) + 1] AS DOUBLE) AS v FROM embeddings, range(64) t(i)), mm AS (SELECT d, min(v) AS mn, max(v) AS mx FROM ex GROUP BY 1), b AS MATERIALIZED (SELECT vec_id, ex.d, CASE WHEN mx = mn THEN 0 ELSE least(9, CAST(floor((v - mn) * 10.0 / (mx - mn)) AS BIGINT)) END AS bin FROM ex JOIN mm ON mm.d = ex.d), cnt AS (SELECT d, bin, count(*) AS c FROM b GROUP BY 1, 2), nn AS (SELECT count(*) AS n FROM embeddings), term AS (SELECT d, bin, CAST(floor(ln(CAST((SELECT n FROM nn) AS DOUBLE) / c) * 1000000000 + 0.5) AS BIGINT) AS tn FROM cnt) SELECT vec_id, hbos_nano FROM (SELECT vec_id, CAST(sum(tn) AS BIGINT) AS hbos_nano FROM b JOIN term USING (d, bin) GROUP BY 1) ORDER BY hbos_nano DESC, vec_id LIMIT 20',
        "conformal_interval": 'WITH d AS (SELECT lang, doc_id % 2 AS split, CAST(n_chars AS BIGINT) AS v FROM documents), cal AS (SELECT lang, v FROM d WHERE split = 0), med AS (SELECT lang, v AS med FROM (SELECT lang, v, row_number() OVER (PARTITION BY lang ORDER BY v) AS rn, count(*) OVER (PARTITION BY lang) AS n FROM cal) WHERE rn = (n - 1) // 2 + 1), sc AS (SELECT c.lang, abs(c.v - m.med) AS s FROM cal c JOIN med m USING (lang)), q AS (SELECT lang, s AS qhat FROM (SELECT lang, s, row_number() OVER (PARTITION BY lang ORDER BY s) AS rn, count(*) OVER (PARTITION BY lang) AS n FROM sc) WHERE rn = least(n, (9 * (n + 1) + 9) // 10)), tst AS (SELECT lang, v FROM d WHERE split = 1), cov AS (SELECT t.lang, CAST(count(*) AS BIGINT) AS n_test, CAST(sum(CASE WHEN abs(t.v - m.med) <= q.qhat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered FROM tst t JOIN med m USING (lang) JOIN q USING (lang) GROUP BY 1), nc AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_cal FROM cal GROUP BY 1) SELECT m.lang, nc.n_cal, cov.n_test, m.med, q.qhat, cov.n_covered FROM med m JOIN q USING (lang) JOIN cov USING (lang) JOIN nc USING (lang) ORDER BY m.lang',
        "token_waterfill": "WITH ns AS (SELECT source, CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS n FROM documents GROUP BY 1), tot AS (SELECT CAST(sum(n) // 2 AS BIGINT) AS b, count(*) AS m FROM ns), ordered AS (SELECT source, n, row_number() OVER (ORDER BY n, source) AS k, COALESCE(CAST(sum(n) OVER (ORDER BY n, source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS p FROM ns), cand AS (SELECT DISTINCT t FROM (SELECT n AS t FROM ns UNION ALL SELECT greatest(0, ((SELECT b FROM tot) - p) // ((SELECT m FROM tot) - k + 1)) FROM ordered)), ev AS (SELECT c.t, CAST(sum(least(ns.n, c.t)) AS BIGINT) AS f FROM cand c CROSS JOIN ns GROUP BY 1), ts AS (SELECT COALESCE(max(t), 0) AS tstar FROM ev WHERE f <= (SELECT b FROM tot)), lv AS (SELECT (SELECT b FROM tot) - CAST(sum(least(n, (SELECT tstar FROM ts))) AS BIGINT) AS l FROM ns), pri AS (SELECT source, row_number() OVER (ORDER BY n DESC, source) AS r FROM ns WHERE n > (SELECT tstar FROM ts)) SELECT ns.source, ns.n AS n_tokens, least(ns.n, (SELECT tstar FROM ts)) + CASE WHEN pri.r IS NOT NULL AND pri.r <= (SELECT l FROM lv) THEN 1 ELSE 0 END AS alloc FROM ns LEFT JOIN pri USING (source) ORDER BY ns.source",
        "mmr_select": _mmr_oracle(),
        "length_emd": 'WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1), prs AS (SELECT a.source AS sa, b.source AS sb FROM ns a JOIN ns b ON a.source < b.source), ev AS (SELECT p.sa, p.sb, h.v, CAST(sum(CASE WHEN h.source = p.sa THEN c ELSE 0 END) AS BIGINT) AS ca, CAST(sum(CASE WHEN h.source = p.sb THEN c ELSE 0 END) AS BIGINT) AS cb FROM prs p JOIN h ON h.source = p.sa OR h.source = p.sb GROUP BY 1, 2, 3), w AS (SELECT sa, sb, v, CAST(sum(ca) OVER (PARTITION BY sa, sb ORDER BY v) AS BIGINT) AS cuma, CAST(sum(cb) OVER (PARTITION BY sa, sb ORDER BY v) AS BIGINT) AS cumb, lead(v) OVER (PARTITION BY sa, sb ORDER BY v) AS nv FROM ev), t AS (SELECT sa, sb, CAST(sum(abs(cuma * (SELECT n FROM ns WHERE source = sb) - cumb * (SELECT n FROM ns WHERE source = sa)) * (nv - v)) AS BIGINT) AS w1 FROM w WHERE nv IS NOT NULL GROUP BY 1, 2) SELECT t.sa AS source_a, t.sb AS source_b, na.n AS n_a, nb.n AS n_b, t.w1 AS w1_num FROM t JOIN ns na ON na.source = t.sa JOIN ns nb ON nb.source = t.sb ORDER BY source_a, source_b',
        "isotonic_calibration": "WITH o AS (SELECT CAST(round(value * 100) AS BIGINT) AS c, event_id, CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p FROM events), b AS (SELECT ntile(10) OVER (ORDER BY c, event_id) AS bin, p FROM o), g AS (SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n, CAST(sum(p) AS BIGINT) AS pos FROM b GROUP BY 1), wins AS (SELECT j.bin AS j, k.bin AS k, CAST((1000000 * sum(x.pos)) // sum(x.n) AS BIGINT) AS r FROM g j JOIN g k ON j.bin <= k.bin JOIN g x ON x.bin BETWEEN j.bin AND k.bin GROUP BY 1, 2), inn AS (SELECT w.j, i.bin AS i, min(w.r) AS mn FROM wins w JOIN g i ON w.j <= i.bin AND w.k >= i.bin GROUP BY 1, 2), iso AS (SELECT i, CAST(max(mn) AS BIGINT) AS iso_ppm FROM inn GROUP BY 1) SELECT g.bin, g.n, g.pos AS n_pos, iso.iso_ppm FROM g JOIN iso ON iso.i = g.bin ORDER BY g.bin",
        "curriculum_order": 'WITH d AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS v FROM documents), b AS (SELECT doc_id, source, v, CAST(ntile(10) OVER (ORDER BY v, doc_id) AS BIGINT) AS decile FROM d), r AS (SELECT doc_id, decile, source, v, row_number() OVER (PARTITION BY decile, source ORDER BY v, doc_id) - 1 AS rr FROM b), p AS (SELECT doc_id, decile, CAST(row_number() OVER (ORDER BY decile, rr, source) - 1 AS BIGINT) AS position FROM r) SELECT doc_id, decile, position FROM p ORDER BY doc_id',
        "padding_waste": "WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v FROM documents), cfg AS (SELECT * FROM (VALUES ('random', 16), ('random', 64), ('sorted', 16), ('sorted', 64)) t(ordering, b)), rnk AS (SELECT doc_id, v, row_number() OVER (ORDER BY doc_id) - 1 AS r_rand, row_number() OVER (ORDER BY v, doc_id) - 1 AS r_sort FROM d), ba AS (SELECT c.ordering, c.b, (CASE WHEN c.ordering = 'random' THEN r_rand ELSE r_sort END) // c.b AS bid, v FROM rnk JOIN cfg c ON TRUE), ag AS (SELECT ordering, b, bid, CAST(count(*) AS BIGINT) AS rws, max(v) AS mx, CAST(sum(v) AS BIGINT) AS sv FROM ba GROUP BY 1, 2, 3) SELECT ordering, CAST(b AS BIGINT) AS batch_size, CAST(count(*) AS BIGINT) AS n_batches, CAST((1000000 * (sum(rws * mx) - sum(sv))) // sum(rws * mx) AS BIGINT) AS waste_ppm FROM ag GROUP BY 1, 2 ORDER BY ordering, batch_size",
        "rank_rbo": "WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents), st AS MATERIALIZED (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1), a AS MATERIALIZED (SELECT term, row_number() OVER (ORDER BY df DESC, term) AS ra FROM st), b AS MATERIALIZED (SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS rb FROM st) SELECT CAST(50 AS BIGINT) AS depth, CAST(sum(tn) AS BIGINT) AS rbo_nano FROM (SELECT CAST(floor((1 - 0.9) * power(0.9, CAST(t.i AS DOUBLE)) * (SELECT count(*) FROM a JOIN b USING (term) WHERE a.ra <= t.i + 1 AND b.rb <= t.i + 1) / (t.i + 1) * 1000000000 + 0.5) AS BIGINT) AS tn FROM range(50) t(i))",
        "clustering_coefficient": 'WITH ui AS (SELECT DISTINCT user_id, CAST(regexp_extract(props, \'"k":\\s*(-?\\d+)\', 1) AS BIGINT) AS item FROM events WHERE event_type = \'view\'), e0 AS (SELECT a.item AS a, b.item AS b, count(*) AS n FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item GROUP BY 1, 2), e AS MATERIALIZED (SELECT a, b FROM e0 WHERE n >= 2), tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b), deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY 1), wdg AS (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) AS w FROM deg) SELECT tri.t AS n_triangles, wdg.w AS n_wedges, CAST(CASE WHEN wdg.w = 0 THEN 0 ELSE (1000000 * 3 * tri.t) // wdg.w END AS BIGINT) AS cc_ppm FROM tri, wdg',
        "markov_stationary": _markov_stationary_oracle(),
        "join_cardinality_model": 'WITH cfg AS (SELECT \'orders_customer\' AS j), oc AS (SELECT CAST(count(*) AS BIGINT) AS nl, CAST(count(DISTINCT o_custkey) AS BIGINT) AS dl FROM orders), cc AS (SELECT CAST(count(*) AS BIGINT) AS nr, CAST(count(DISTINCT c_custkey) AS BIGINT) AS dr FROM customer), tc AS (SELECT CAST(count(*) AS BIGINT) AS t FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey), lo AS (SELECT CAST(count(*) AS BIGINT) AS nl, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS dl FROM lineitem), oo AS (SELECT CAST(count(*) AS BIGINT) AS nr, CAST(count(DISTINCT o_orderkey) AS BIGINT) AS dr FROM orders), tl AS (SELECT CAST(count(*) AS BIGINT) AS t FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) SELECT * FROM (SELECT \'orders_customer\' AS "join", oc.nl AS n_left, cc.nr AS n_right, oc.dl AS d_left, cc.dr AS d_right, (oc.nl * cc.nr) // greatest(oc.dl, cc.dr) AS est, tc.t AS true_n, (1000000 * abs((oc.nl * cc.nr) // greatest(oc.dl, cc.dr) - tc.t)) // greatest(tc.t, 1) AS err_ppm FROM oc, cc, tc UNION ALL SELECT \'lineitem_orders\', lo.nl, oo.nr, lo.dl, oo.dr, (lo.nl * oo.nr) // greatest(lo.dl, oo.dr), tl.t, (1000000 * abs((lo.nl * oo.nr) // greatest(lo.dl, oo.dr) - tl.t)) // greatest(tl.t, 1) FROM lo, oo, tl) ORDER BY "join"',
        "oov_rate": "WITH toks AS (SELECT source, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents), tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1), vocab AS (SELECT term FROM (SELECT term, row_number() OVER (ORDER BY c DESC, term) AS rn FROM tc) WHERE rn <= 1000), per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens, CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov FROM toks t LEFT JOIN vocab v ON v.term = t.term GROUP BY 1) SELECT source, n_tokens, n_oov, (1000000 * n_oov) // n_tokens AS oov_ppm FROM per ORDER BY source",
        "pps_systematic": 'WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w FROM documents), tot AS (SELECT CAST(sum(w) AS BIGINT) AS t FROM d), c AS (SELECT doc_id, w, COALESCE(CAST(sum(w) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum0 FROM d) SELECT doc_id, w AS n_chars, (cum0 * 50) // (SELECT t FROM tot) AS pick_idx FROM c WHERE ((cum0 + w) * 50) // (SELECT t FROM tot) > (cum0 * 50) // (SELECT t FROM tot) ORDER BY doc_id',
        "hill_tail": 'WITH r AS (SELECT CAST(n_chars AS BIGINT) AS v, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn FROM documents), ref AS (SELECT v AS xr FROM r WHERE rn = 101), s AS (SELECT CAST(sum(CAST(floor(ln(CAST(v AS DOUBLE) / (SELECT xr FROM ref)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS sl FROM r WHERE rn <= 100) SELECT CAST(100 AS BIGINT) AS k, s.sl AS sum_log_nano, CAST(CASE WHEN s.sl = 0 THEN 0 ELSE (CAST(100000000000 AS BIGINT) * 1000000) // s.sl END AS BIGINT) AS alpha_micro FROM s',
        "gini_split": 'WITH h AS (SELECT CAST(n_chars AS BIGINT) AS v, lang, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), grid AS (SELECT DISTINCT v FROM h), langs AS (SELECT DISTINCT lang FROM h), cell AS (SELECT g.v, l.lang, COALESCE(h.c, 0) AS c FROM grid g CROSS JOIN langs l LEFT JOIN h ON h.v = g.v AND h.lang = l.lang), cum AS (SELECT v, lang, CAST(sum(c) OVER (PARTITION BY lang ORDER BY v) AS BIGINT) AS cl, CAST(sum(c) OVER (PARTITION BY lang) AS BIGINT) AS t FROM cell), agg AS (SELECT v, CAST(sum(cl) AS BIGINT) AS n_l, CAST(sum(t - cl) AS BIGINT) AS n_r, CAST(sum(cl * cl) AS BIGINT) AS sl2, CAST(sum((t - cl) * (t - cl)) AS BIGINT) AS sr2 FROM cum GROUP BY 1) SELECT v, n_l AS n_left, sl2 * n_r + sr2 * n_l AS gain_num, n_l * n_r AS gain_den FROM agg WHERE n_r > 0 ORDER BY v',
        "term_burstiness": "WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents), pd AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2), st AS (SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(c) AS BIGINT) AS sum_c, CAST(sum(c * c) AS BIGINT) AS sum_c2 FROM pd GROUP BY 1), top AS (SELECT * FROM st ORDER BY df DESC, term LIMIT 50), nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents) SELECT term, df, sum_c, sum_c2, (1000000 * ((SELECT n FROM nd) * sum_c2 - sum_c * sum_c)) // (sum_c * (SELECT n FROM nd)) AS vmr_ppm FROM top ORDER BY term",
        "coverage_select": _coverage_oracle(),
        "curation_pipeline": _CURATION_SQL,
        "good_turing": "WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents), tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1), fof AS (SELECT c AS r, CAST(count(*) AS BIGINT) AS n_r FROM tc GROUP BY 1) SELECT f.r, f.n_r, CAST((f.r + 1) * COALESCE(f2.n_r, 0) AS BIGINT) AS gt_num, f.n_r AS gt_den FROM fof f LEFT JOIN fof f2 ON f2.r = f.r + 1 ORDER BY f.r",
        "join_order_costs": "WITH s AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM customer) AS nc, (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer) AS dcc, (SELECT CAST(count(*) AS BIGINT) FROM orders) AS no_, (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders) AS doc_, (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders) AS doo, (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS nl, (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lineitem) AS dlo), x AS (SELECT *, (nc * no_) // greatest(dcc, doc_) AS n1a, (nl * no_) // greatest(dlo, doo) AS n1b FROM s), y AS (SELECT *, n1a + (n1a * nl) // greatest(least(doo, n1a), dlo) AS costa, n1b + (n1b * nc) // greatest(least(doc_, n1b), dcc) AS costb FROM x), r AS (SELECT 'C,O,L' AS join_order, costa AS cost FROM y UNION ALL SELECT 'O,C,L', costa FROM y UNION ALL SELECT 'L,O,C', costb FROM y UNION ALL SELECT 'O,L,C', costb FROM y) SELECT join_order, cost, CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_best FROM (SELECT *, row_number() OVER (ORDER BY cost, join_order) AS rn FROM r) ORDER BY join_order",
        "shapley_coverage": "WITH lx AS MATERIALIZED (SELECT lang, CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT) AS li FROM (SELECT DISTINCT lang FROM documents)), tl AS MATERIALIZED (SELECT DISTINCT t.term, lx.li FROM (SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '')) AS term FROM documents) t JOIN lx USING (lang)), tm AS (SELECT term, CAST(sum(1 << li) AS BIGINT) AS mask FROM tl GROUP BY 1), mc AS MATERIALIZED (SELECT mask, CAST(count(*) AS BIGINT) AS c FROM tm GROUP BY 1), subsets AS (SELECT CAST(t.i AS BIGINT) AS s FROM range(32) t(i)), vv AS MATERIALIZED (SELECT su.s, CAST(COALESCE(sum(CASE WHEN CAST(mc.mask AS BIGINT) & su.s <> 0 THEN mc.c ELSE 0 END), 0) AS BIGINT) AS v FROM subsets su CROSS JOIN mc GROUP BY 1), phi AS (SELECT l.lang, l.li, CAST(sum((CASE bit_count(su.s) WHEN 0 THEN 24 WHEN 1 THEN 6 WHEN 2 THEN 4 WHEN 3 THEN 6 ELSE 24 END) * (v1.v - v0.v)) AS BIGINT) AS phi_num FROM lx l JOIN subsets su ON (su.s & (1 << l.li)) = 0 JOIN vv v0 ON v0.s = su.s JOIN vv v1 ON v1.s = (su.s | (1 << l.li)) GROUP BY 1, 2) SELECT p.lang, p.phi_num, CAST(120 AS BIGINT) AS phi_den, (SELECT v FROM vv WHERE s = (1 << p.li)) AS v_solo, (SELECT v FROM vv WHERE s = 31) AS v_all FROM phi p ORDER BY p.lang",
        "modularity": "WITH RECURSIVE ui AS (SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item FROM events WHERE event_type = 'view'), prs AS (SELECT a.item AS ia, b.item AS ib FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item GROUP BY 1, 2 HAVING count(*) >= 2), ed AS MATERIALIZED (SELECT ia AS a, ib AS b FROM prs), sym AS MATERIALIZED (SELECT a, b FROM ed UNION ALL SELECT b, a FROM ed), nodes AS (SELECT DISTINCT a AS node FROM sym), reach(x, y) AS (SELECT node, node FROM nodes UNION SELECT r.x, s.b FROM reach r JOIN sym s ON s.a = r.y), comp AS MATERIALIZED (SELECT x AS node, CAST(min(y) AS BIGINT) AS c FROM reach GROUP BY 1), ecs AS (SELECT cp.c, CAST(count(*) AS BIGINT) AS ec FROM ed JOIN comp cp ON cp.node = ed.a GROUP BY 1), dcs AS (SELECT cp.c, CAST(count(*) AS BIGINT) AS dc FROM sym JOIN comp cp ON cp.node = sym.a GROUP BY 1), mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM ed), q AS (SELECT CAST(sum(4 * (SELECT m FROM mm) * COALESCE(e.ec, 0) - d.dc * d.dc) AS BIGINT) AS qn FROM dcs d LEFT JOIN ecs e USING (c)) SELECT (SELECT m FROM mm) AS n_edges, (SELECT CAST(count(DISTINCT c) AS BIGINT) FROM comp) AS n_components, q.qn AS q_num, 4 * (SELECT m FROM mm) * (SELECT m FROM mm) AS q_den FROM q",
        "runs_test": 'WITH d AS (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev FROM orders GROUP BY 1), md AS (SELECT rev AS med FROM (SELECT rev, row_number() OVER (ORDER BY rev, day) AS rn, count(*) OVER () AS n FROM d) WHERE rn = (n - 1) // 2 + 1), sg AS (SELECT day, CASE WHEN rev > (SELECT med FROM md) THEN 1 ELSE 0 END AS s, LAG(CASE WHEN rev > (SELECT med FROM md) THEN 1 ELSE 0 END) OVER (ORDER BY day) AS ps FROM d), st AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS n1, CAST(count(*) - sum(s) AS BIGINT) AS n2, CAST(1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps THEN 1 ELSE 0 END) AS BIGINT) AS r FROM sg) SELECT n AS n_days, n1 AS n_above, n2 AS n_below, r AS n_runs, CAST(CASE WHEN n1 = 0 OR n2 = 0 OR n < 2 THEN 0 ELSE floor((r - (2.0 * n1 * n2 / n + 1.0)) / sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) / (n * n * (n - 1.0))) * 1000000000 + 0.5) END AS BIGINT) AS z_nano FROM st',
        "heaps_fit": "WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS ws FROM documents), tg AS MATERIALIZED (SELECT doc_id, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, greatest(len(ws) - 1, 1))]) AS ng FROM toks), occ AS (SELECT doc_id // 50 AS b, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY 1), fs AS (SELECT ng, min(doc_id) AS md FROM tg GROUP BY 1), vb AS (SELECT md // 50 AS b, CAST(count(*) AS BIGINT) AS v FROM fs GROUP BY 1), grid AS (SELECT b FROM occ UNION SELECT b FROM vb), mg AS (SELECT g.b, COALESCE(o.c, 0) AS c, COALESCE(vb.v, 0) AS v FROM grid g LEFT JOIN occ o ON o.b = g.b LEFT JOIN vb ON vb.b = g.b), cum AS (SELECT b, CAST(sum(c) OVER (ORDER BY b) AS BIGINT) AS cn, CAST(sum(v) OVER (ORDER BY b) AS BIGINT) AS cv FROM mg), pts AS (SELECT CAST(floor(ln(CAST(cn AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS x, CAST(floor(ln(CAST(cv AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT) AS y FROM cum WHERE cn > 0 AND cv > 0), s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, sum(CAST(x AS HUGEINT) * x) AS sxx, sum(CAST(x AS HUGEINT) * y) AS sxy FROM pts) SELECT n AS n_points, CAST(floor(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) / CAST(n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS beta_nano, CAST(floor((sy - CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) / CAST(n * CAST(sxx AS HUGEINT) - CAST(sx AS HUGEINT) * sx AS DOUBLE) * sx) / n + 0.5) AS BIGINT) AS logk_nano FROM s",
        "lead_lag": "WITH RECURSIVE d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS v, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p FROM events GROUP BY 1), bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM d), grid(day) AS (SELECT lo FROM bounds UNION ALL SELECT day + 1 FROM grid WHERE day < (SELECT hi FROM bounds)), g AS MATERIALIZED (SELECT grid.day, COALESCE(d.v, 0) AS v, COALESCE(d.p, 0) AS p FROM grid LEFT JOIN d USING (day)), lags AS (SELECT CAST(t.i AS BIGINT) AS lag FROM range(8) t(i)), pr AS (SELECT l.lag, a.v AS x, b.p AS y FROM lags l JOIN g a ON TRUE JOIN g b ON b.day = a.day + l.lag), s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy FROM pr GROUP BY 1) SELECT lag, n AS n_pairs, n * sxy - sx * sy AS cov_num FROM s ORDER BY lag",
        "video_framesample": "WITH r AS (SELECT doc_id, 'https://media.example/' || doc_id || '/clip-0.mp4' AS media_ref FROM documents), d AS (SELECT doc_id, media_ref, 1000 + CAST(concat('0x', substr(md5(media_ref), 5, 2)) AS INTEGER) * 37 AS dur FROM r), f AS (SELECT doc_id, media_ref, dur, (dur * 25) // 1000 AS nf FROM d) SELECT doc_id, media_ref, CAST(dur AS BIGINT) AS duration_ms, CAST(nf AS BIGINT) AS n_frames, CAST(CASE WHEN nf > 0 THEN (nf + 4) // 5 ELSE 0 END AS BIGINT) AS n_sampled, CAST(CASE WHEN nf > 0 THEN 0 ELSE -1 END AS BIGINT) AS first_idx, CAST(CASE WHEN nf > 0 THEN ((nf - 1) // 5) * 5 ELSE -1 END AS BIGINT) AS last_idx FROM f ORDER BY doc_id",
        "jonckheere": 'WITH h AS (SELECT source, CAST(n_chars AS BIGINT) AS v, CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2), pr AS (SELECT a.v AS va, a.c AS ca, b.v AS vb, b.c AS cb FROM h a JOIN h b ON a.source < b.source), j AS (SELECT CAST(sum(CASE WHEN va < vb THEN 2 * ca * cb WHEN va = vb THEN ca * cb ELSE 0 END) AS BIGINT) AS j2 FROM pr), ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS ni FROM h GROUP BY 1), s AS (SELECT CAST(sum(ni) AS BIGINT) AS n, CAST(sum(ni * ni) AS BIGINT) AS ssq, CAST(sum(ni * ni * (2 * ni + 3)) AS BIGINT) AS scu, CAST(count(*) AS BIGINT) AS k FROM ns) SELECT s.n, s.k AS k_groups, j.j2, (s.n * s.n - s.ssq) // 2 AS mu2, CAST(floor(((j.j2 - (s.n * s.n - s.ssq) // 2) / 2.0) / sqrt(CAST(s.n * s.n * (2 * s.n + 3) - s.scu AS DOUBLE) / 72.0) * 1000000000 + 0.5) AS BIGINT) AS z_nano FROM s, j',
        "james_stein": 'WITH st AS (SELECT source, CAST(sum(n_chars) AS HUGEINT) AS s, CAST(sum(CAST(n_chars AS BIGINT) * n_chars) AS HUGEINT) AS q, CAST(count(*) AS HUGEINT) AS n FROM documents GROUP BY 1), mi AS (SELECT source, n, (1000000 * s) // n AS m, (CAST(1000000 AS HUGEINT) * 1000000 * (n * q - s * s)) // (n * n * n) AS vm FROM st), g AS (SELECT CAST(count(*) AS HUGEINT) AS k, sum(m) AS sm, sum(vm) AS svm FROM mi), g2 AS (SELECT k, sm // k AS mbar, svm // k AS vbar FROM g), s2t AS (SELECT CAST(sum((m - (SELECT mbar FROM g2)) * (m - (SELECT mbar FROM g2))) AS HUGEINT) AS s2 FROM mi), ft AS (SELECT greatest(CAST(0 AS HUGEINT), (SELECT s2 FROM s2t) - ((SELECT k FROM g2) - 3) * (SELECT vbar FROM g2)) AS f) SELECT source, CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS mean_micro, CAST(CASE WHEN (SELECT s2 FROM s2t) = 0 THEN (SELECT mbar FROM g2) ELSE (SELECT mbar FROM g2) + ((SELECT f FROM ft) * (m - (SELECT mbar FROM g2))) // (SELECT s2 FROM s2t) END AS BIGINT) AS shrunk_micro FROM mi ORDER BY source',
        "lttb_downsample": 'WITH RECURSIVE d AS MATERIALIZED (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev FROM orders GROUP BY 1), idx AS MATERIALIZED (SELECT day, rev, row_number() OVER (ORDER BY day) - 1 AS i FROM d), mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM idx), sel(b, pd, pr) AS (SELECT CAST(-1 AS BIGINT), (SELECT day FROM idx WHERE i = 0), (SELECT rev FROM idx WHERE i = 0) UNION ALL SELECT nb, day, rev FROM (WITH cur AS (SELECT * FROM sel), st AS (SELECT cur.b + 1 AS nb, cur.pd, cur.pr, (SELECT m FROM mm) AS m FROM cur), cand AS (SELECT s.nb, s.pd, s.pr, s.m, i.day, i.rev FROM st s JOIN idx i ON i.i >= 1 + s.nb * (s.m - 2) // 20 AND i.i < 1 + (s.nb + 1) * (s.m - 2) // 20 WHERE s.nb < 20 AND s.m > 2), nxtb AS (SELECT s.nb, CAST(sum(i.day) AS BIGINT) AS sxn, CAST(sum(i.rev) AS BIGINT) AS syn, CAST(count(*) AS BIGINT) AS den FROM st s JOIN idx i ON i.i >= 1 + (s.nb + 1) * (s.m - 2) // 20 AND i.i < 1 + (s.nb + 2) * (s.m - 2) // 20 WHERE s.nb < 19 GROUP BY 1), anchor AS (SELECT s.nb, CASE WHEN s.nb < 19 AND nx.den > 0 THEN nx.sxn ELSE (SELECT day FROM idx WHERE i = s.m - 1) END AS sxn, CASE WHEN s.nb < 19 AND nx.den > 0 THEN nx.syn ELSE (SELECT rev FROM idx WHERE i = s.m - 1) END AS syn, CASE WHEN s.nb < 19 AND nx.den > 0 THEN nx.den ELSE 1 END AS den FROM st s LEFT JOIN nxtb nx ON nx.nb = s.nb), scored AS (SELECT c.nb, c.day, c.rev, abs((c.pd * a.den - a.sxn) * (c.rev - c.pr) - (c.pd - c.day) * (a.syn - c.pr * a.den)) AS sc FROM cand c JOIN anchor a ON a.nb = c.nb) SELECT nb, day, rev FROM scored ORDER BY sc DESC, day LIMIT 1)), pts AS (SELECT b, pd AS day, pr AS rev FROM sel UNION ALL SELECT 99, (SELECT day FROM idx WHERE i = (SELECT m FROM mm) - 1), (SELECT rev FROM idx WHERE i = (SELECT m FROM mm) - 1) WHERE (SELECT m FROM mm) > 1) SELECT CAST(row_number() OVER (ORDER BY b) - 1 AS BIGINT) AS ord, day, rev FROM pts ORDER BY ord',
        "sprt_crossing": "WITH e AS (SELECT epoch_us(ts) AS tsu, event_id, CASE WHEN event_type = 'purchase' THEN 223143551 ELSE -64538521 END AS llr FROM events), w AS (SELECT CAST(sum(llr) OVER (ORDER BY tsu, event_id) AS BIGINT) AS c, CAST(row_number() OVER (ORDER BY tsu, event_id) - 1 AS BIGINT) AS r FROM e), x AS (SELECT r, c FROM w WHERE c >= 2944438979 OR c <= -2944438979 ORDER BY r LIMIT 1) SELECT CAST(COALESCE(CASE WHEN (SELECT c FROM x) >= 2944438979 THEN 1 WHEN (SELECT c FROM x) <= -2944438979 THEN -1 END, 0) AS BIGINT) AS decision, CAST(COALESCE((SELECT r FROM x), -1) AS BIGINT) AS crossing_rank, CAST(COALESCE((SELECT c FROM x), 0) AS BIGINT) AS cum_llr_nano",
        "lis_revenue": 'WITH RECURSIVE d AS MATERIALIZED (SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev FROM orders GROUP BY 1), idx AS MATERIALIZED (SELECT day, rev, row_number() OVER (ORDER BY day) - 1 AS i FROM d), lis(i, l) AS (SELECT i, CAST(1 AS BIGINT) FROM idx UNION SELECT b.i, a.l + 1 FROM lis a JOIN idx xa ON xa.i = a.i JOIN idx b ON b.i > xa.i AND b.rev > xa.rev), ml AS (SELECT i, CAST(max(l) AS BIGINT) AS l FROM lis GROUP BY 1), mx AS (SELECT max(l) AS best FROM ml) SELECT (SELECT CAST(count(*) AS BIGINT) FROM idx) AS n_days, CAST(COALESCE((SELECT best FROM mx), 0) AS BIGINT) AS lis_len, CAST(COALESCE((SELECT min(idx.day) FROM ml JOIN idx ON idx.i = ml.i WHERE ml.l = (SELECT best FROM mx)), -1) AS BIGINT) AS end_day',
        "voptimal_histogram": _voptimal_oracle(),
        "knapsack_sources": "WITH RECURSIVE stt AS MATERIALIZED (SELECT source, CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS nt FROM documents GROUP BY 1), toks AS (SELECT source, list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS ws FROM documents), tri AS (SELECT DISTINCT source, ng FROM (SELECT source, unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, greatest(len(ws) - 1, 1))]) AS ng FROM toks)), vv AS (SELECT source, CAST(count(*) AS BIGINT) AS v FROM tri GROUP BY 1), it AS MATERIALIZED (SELECT s.source, CAST(s.nt // 100 AS BIGINT) AS w, CAST(COALESCE(vv.v, 0) AS BIGINT) AS v, CAST(row_number() OVER (ORDER BY s.source) AS BIGINT) AS i FROM stt s LEFT JOIN vv USING (source)), cap AS (SELECT CAST((sum(nt) // 2) // 100 AS BIGINT) AS c FROM stt), caps(c) AS (SELECT CAST(0 AS BIGINT) UNION ALL SELECT c + 1 FROM caps WHERE c < (SELECT c FROM cap)), kn(i, c, d) AS (SELECT CAST(0 AS BIGINT), c, CAST(0 AS BIGINT) FROM caps UNION ALL SELECT i, c, d FROM (WITH cur AS (SELECT * FROM kn), stp AS (SELECT cur.i + 1 AS ni, (SELECT w FROM it WHERE it.i = cur.i + 1) AS wi, (SELECT v FROM it WHERE it.i = cur.i + 1) AS vi, cur.c, cur.d FROM cur WHERE cur.i + 1 <= (SELECT count(*) FROM it)) SELECT s.ni AS i, s.c AS c, CASE WHEN tk.d IS NOT NULL AND tk.d + s.vi > s.d THEN tk.d + s.vi ELSE s.d END AS d FROM stp s LEFT JOIN cur tk ON tk.c = s.c - s.wi)), bt(i, c) AS (SELECT CAST((SELECT count(*) FROM it) AS BIGINT), (SELECT c FROM cap) UNION ALL SELECT b.i - 1, b.c - CASE WHEN (SELECT d FROM kn k1 WHERE k1.i = b.i AND k1.c = b.c) <> (SELECT d FROM kn k0 WHERE k0.i = b.i - 1 AND k0.c = b.c) THEN (SELECT w FROM it WHERE it.i = b.i) ELSE 0 END FROM bt b WHERE b.i >= 1) SELECT it.source, it.w AS w_units, it.v AS value, CAST(CASE WHEN (SELECT d FROM kn k1 WHERE k1.i = it.i AND k1.c = bt.c) <> (SELECT d FROM kn k0 WHERE k0.i = it.i - 1 AND k0.c = bt.c) THEN 1 ELSE 0 END AS BIGINT) AS chosen FROM it JOIN bt ON bt.i = it.i ORDER BY it.source",
        "theil_index": "WITH st AS MATERIALIZED (SELECT source, CAST(sum(n_chars) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1), g AS (SELECT CAST(sum(s) AS BIGINT) AS gs, CAST(sum(n) AS BIGINT) AS gn FROM st), rw AS (SELECT d.source, CAST(floor((CAST(d.n_chars AS DOUBLE) * st.n / st.s) * ln(CAST(d.n_chars AS DOUBLE) * st.n / st.s) * 1000000000 + 0.5) AS BIGINT) AS wn, CAST(floor((CAST(d.n_chars AS DOUBLE) * (SELECT gn FROM g) / (SELECT gs FROM g)) * ln(CAST(d.n_chars AS DOUBLE) * (SELECT gn FROM g) / (SELECT gs FROM g)) * 1000000000 + 0.5) AS BIGINT) AS gt FROM documents d JOIN st USING (source)), ws AS (SELECT source, CAST(sum(wn) AS BIGINT) AS w, CAST(sum(gt) AS BIGINT) AS gg FROM rw GROUP BY 1), wt AS (SELECT 'within' AS scope, ws.source, ws.w // st.n AS t_nano FROM ws JOIN st USING (source)), bt AS (SELECT 'between' AS scope, '*' AS source, CAST(sum(CAST(floor((CAST(st.s AS DOUBLE) / (SELECT gs FROM g)) * ln(CAST(st.s * (SELECT gn FROM g) AS DOUBLE) / CAST((SELECT gs FROM g) * st.n AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS t_nano FROM st), tt AS (SELECT 'total' AS scope, '*' AS source, CAST((SELECT sum(gg) FROM ws) // (SELECT gn FROM g) AS BIGINT) AS t_nano) SELECT * FROM wt UNION ALL SELECT * FROM bt UNION ALL SELECT * FROM tt ORDER BY scope, source",
    }
