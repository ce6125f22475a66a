"""Lexical retrieval scoring (BM25) over the document corpus.

The missing third leg next to embedding ANN (stages/ann.py) and the
inverted index (q_inverted_index): score every document against a fixed
query-term set with Okapi BM25 and return the top-k. Distributed shape:

- the per-batch tokenize pass FILTERS to query terms immediately
  (``pc.is_in`` on the flattened word array), so the term stream that
  leaves each batch is O(matches), never O(tokens);
- document length and term frequency are computed in the same pass —
  one row (doc_id, term, tf, dl) per matching (doc, term);
- N, avgdl and per-term document frequencies reduce through two tiny
  aggregates (df is bounded by |terms| × blocks on the combiner side);
- scoring is a map over the match stream with the scalar stats
  broadcast in the closure, followed by one small groupby(doc) sum and
  a deterministic (rounded score DESC, doc_id) top-k.

Uses the Lucene BM25 variant: idf = ln(1 + (N - df + 0.5)/(df + 0.5)).
Both engine and the DuckDB oracle evaluate ln via the same system libm
on identical rational inputs, and the reported score rounds to 6dp, so
the SQL twin hash-matches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def bm25_topk(ds, terms: list[str], *, k: int = 20, k1: float = 1.2,
              b: float = 0.75, column: str = "text",
              id_column: str = "doc_id"):
    """Top-``k`` documents by BM25 against ``terms``.

    Returns a Dataset (doc_id, score) sorted by (score DESC, doc_id),
    score rounded 6dp. Ties at the boundary are broken by doc_id, so
    the cut is deterministic on any cluster shape.
    """
    import pyarrow.compute as pc
    import ray.data  # noqa: F401 - Dataset methods
    from ray.data.aggregate import Count, Mean, Sum

    term_set = pa.array(sorted(set(terms)), pa.string())

    def match_stream(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lists = pc.split_pattern_regex(pc.utf8_lower(texts), pattern=r"\s+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        # per-row doc length BEFORE the term filter
        dl = np.zeros(len(batch), dtype=np.int64)
        if len(parent):
            par_all = parent.to_numpy(zero_copy_only=False).astype(np.int64)
            dl = np.bincount(par_all, minlength=len(batch)).astype(np.int64)
        hit = pc.is_in(flat, value_set=term_set)
        flat = flat.filter(hit)
        parent = parent.filter(hit)
        ids = batch.column(id_column)
        g = pa.table({"row": parent, "term": flat}).group_by(
            ["row", "term"]).aggregate([("term", "count")])
        rows = g.column("row").to_numpy(zero_copy_only=False).astype(
            np.int64)
        return pa.table({
            id_column: ids.take(pa.array(rows)),
            "term": g.column("term"),
            "tf": pc.cast(g.column("term_count"), pa.int64()),
            "dl": pa.array(dl[rows], pa.int64()),
        })

    matches = ds.map_batches(
        match_stream, batch_format="pyarrow").materialize()

    # corpus stats: N and avgdl over ALL docs (cheap dedicated aggregate —
    # reading two columns of the scan, no shuffle beyond the combiner)
    def dl_stream(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        n_words = pc.cast(pc.count_substring_regex(texts, r"\S+"),
                          pa.int64())
        return pa.table({"dl": n_words})

    stats = ds.map_batches(dl_stream, batch_format="pyarrow").aggregate(
        Count(), Mean("dl"))
    n_docs = int(stats["count()"])
    avgdl = float(stats["mean(dl)"])

    dfs = {r["term"]: r["df"] for r in
           matches.groupby("term").aggregate(
               Count(alias_name="df")).take_all()}

    idf = {t: float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))
           for t, df in dfs.items()}

    def score(batch: pa.Table) -> pa.Table:
        tf = batch.column("tf").to_numpy(zero_copy_only=False).astype(
            np.float64)
        dl = batch.column("dl").to_numpy(zero_copy_only=False).astype(
            np.float64)
        w = np.array([idf.get(t, 0.0)
                      for t in batch.column("term").to_pylist()])
        s = w * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({id_column: batch.column(id_column),
                         "part": pa.array(s, pa.float64())})

    # hash_agg: one group per matching doc is row-scale cardinality
    from .window import hash_agg

    scored = hash_agg(matches.map_batches(score, batch_format="pyarrow"),
                      id_column, [("part", "sum", "raw")])

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("raw").to_numpy(zero_copy_only=False)
        # half-away rounding = DuckDB round() on positives
        return pa.table({
            id_column: t.column(id_column),
            "score": pa.array(np.floor(s * 1e6 + 0.5) / 1e6, pa.float64())})

    return scored.map_batches(finish, batch_format="pyarrow").sort(
        ["score", id_column], descending=[True, False]).limit(k)
