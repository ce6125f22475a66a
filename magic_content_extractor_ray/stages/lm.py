"""N-gram language-model scoring (the perplexity-style quality filter).

Web-scale curation pipelines score every document with a small LM
trained on a trusted corpus and drop the high-perplexity tail (the
CCNet / Wikipedia-LM filter). This module implements the distributed
version with an add-one-smoothed bigram model:

    nll(doc) = − Σ_transitions ln( (c2(w1,w2)+1) / (c1(w1)+V) ) / n

where c2/c1 are train-corpus bigram/unigram token counts and V is the
train vocabulary size. Everything reduces to counts, so the scoring is
exactly reproducible by a SQL twin.

Distributed shape (no broadcast of the LM — it can be larger than any
one node at corpus scale):

1. train unigram/bigram counts: per-batch Arrow ``group_by`` partials →
   one combiner ``groupby(key).Sum`` each;
2. eval docs explode to (doc, bigram, w1, tf) rows — per-batch
   pre-aggregated, so repeated transitions ride as one row;
3. exchange ON THE BIGRAM KEY: tagged union of count rows and eval
   rows; inside each sorted partition the count attaches to every eval
   row of its segment (run-length pass, no join machinery);
4. exchange ON THE FIRST-WORD KEY: same trick attaches c1, after which
   each partition emits PER-DOC PARTIAL (Σ tf·ln(p), Σ tf) rows;
5. one int-key ``groupby(doc)`` finishes the mean.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tokens(batch_texts):
    import pyarrow.compute as pc

    texts = batch_texts
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
    return flat, parent


def _bigrams(flat, parent):
    """(bigram string, w1 string, parent row) for every token transition."""
    import pyarrow.compute as pc

    n = len(flat)
    if n < 2:
        empty = pa.array([], pa.string())
        return empty, empty, pa.array([], parent.type if parent is not None
                                      else pa.int64())
    a = flat.slice(0, n - 1)
    b = flat.slice(1, n - 1)
    bg = pc.binary_join_element_wise(a, b, " ")
    head = parent.slice(0, n - 1)
    same = pc.equal(head, parent.slice(1, n - 1))
    return bg.filter(same), a.filter(same), head.filter(same)


def bigram_lm_scores(train, evalset, *, column: str = "text",
                     id_column: str = "doc_id", num_buckets: int = 64):
    """Score eval docs with an add-one bigram LM trained on ``train``.

    Returns a Dataset (doc_id, n_bigrams, nll) — nll is the mean
    negative log-likelihood per transition, rounded 4dp (half-away, =
    DuckDB round on positives). Eval docs with fewer than 2 words have
    no transitions and produce no row (the SQL twin's universe).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .window import (map_key_partitions, segment_lengths,
                         segment_starts)

    # --- train counts ------------------------------------------------
    def uni_partial(t: pa.Table) -> pa.Table:
        flat, _ = _tokens(t.column(column))
        g = pa.table({"w": flat}).group_by(["w"]).aggregate([("w", "count")])
        return pa.table({"w": g.column("w"),
                         "c": pc.cast(g.column("w_count"), pa.int64())})

    def bi_partial(t: pa.Table) -> pa.Table:
        flat, parent = _tokens(t.column(column))
        bg, _, _ = _bigrams(flat, parent)
        g = pa.table({"bg": bg}).group_by(["bg"]).aggregate(
            [("bg", "count")])
        return pa.table({"bg": g.column("bg"),
                         "c": pc.cast(g.column("bg_count"), pa.int64())})

    # hash_agg: unigram/bigram vocabularies are row-scale group counts
    from .window import hash_agg

    # producer_expands: the count partials are row-expanding tokenizers
    # (docs → distinct-token rows) — see the map-fusion caveat
    c1 = hash_agg(train.map_batches(uni_partial, batch_format="pyarrow"),
                  "w", [("c", "sum", "c1")],
                  producer_expands=True).materialize()  # used 2×
    c2 = hash_agg(train.map_batches(bi_partial, batch_format="pyarrow"),
                  "bg", [("c", "sum", "c2")], producer_expands=True)
    vocab_v = c1.count()  # distinct train unigrams (smoothing constant)

    # --- eval transition rows ----------------------------------------
    def eval_rows(t: pa.Table) -> pa.Table:
        flat, parent = _tokens(t.column(column))
        bg, w1, head = _bigrams(flat, parent)
        ids = t.column(id_column).take(head)
        g = pa.table({"d": pc.cast(ids, pa.int64()), "bg": bg, "w1": w1}
                     ).group_by(["d", "bg", "w1"]).aggregate(
            [("d", "count")])
        return pa.table({"d": g.column("d"), "bg": g.column("bg"),
                         "w1": g.column("w1"),
                         "tf": pc.cast(g.column("d_count"), pa.int64())})

    ev = evalset.map_batches(eval_rows, batch_format="pyarrow")

    # --- exchange 1: attach c2 by bigram ------------------------------
    # count rows and eval rows share one schema: count rows carry c2 and
    # nulls/zeros elsewhere, eval rows carry (d, w1, tf) and c2=0
    u1 = c2.map_batches(
        lambda t: pa.table({
            "bg": t.column("bg"),
            "d": pa.array(np.zeros(len(t), np.int64)),
            "w1": pa.array([None] * len(t), pa.string()),
            "tf": pa.array(np.zeros(len(t), np.int64)),
            "c2": t.column("c2"),
            "side": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow", batch_size=65536)
    # NOTE: no batch_size on this tag map — it fuses with the
    # row-expanding eval_rows tokenizer upstream, so a batch size here
    # would batch ~65536 eval DOCS per tokenize task (the decontam.py
    # fusion caveat); coalescing happens in map_key_partitions below
    e1 = ev.map_batches(
        lambda t: pa.table({
            "bg": t.column("bg"), "d": t.column("d"),
            "w1": t.column("w1"), "tf": t.column("tf"),
            "c2": pa.array(np.zeros(len(t), np.int64)),
            "side": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow")

    def attach_c2(part: pa.Table) -> pa.Table:
        keys = part.column("bg").to_numpy(zero_copy_only=False)
        if not len(keys):
            return pa.table({"d": pa.array([], pa.int64()),
                             "w1": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "c2": pa.array([], pa.int64())})
        side = part.column("side").to_numpy(zero_copy_only=False)
        c2v = part.column("c2").to_numpy(zero_copy_only=False)
        starts = segment_starts(keys)
        lens = segment_lengths(starts, len(keys))
        # sorted by (bg, side): a segment's first row is the count row
        # iff the train corpus saw this bigram
        seg_c2 = np.where(side[starts] == 0, c2v[starts], 0)
        full = np.repeat(seg_c2, lens)
        mask = side == 1
        return pa.table({
            "d": part.column("d").filter(pa.array(mask)),
            "w1": part.column("w1").filter(pa.array(mask)),
            "tf": part.column("tf").filter(pa.array(mask)),
            "c2": pa.array(full[mask], pa.int64())})

    step1 = map_key_partitions(u1.union(e1), "bg", attach_c2,
                               num_buckets=num_buckets,
                               sort_cols=["side"],
                               coalesce_rows=65536,
                               producer_expands=True)

    # --- exchange 2: attach c1 by w1, emit per-doc partials -----------
    u2 = c1.map_batches(
        lambda t: pa.table({
            "w1": t.column("w"),
            "d": pa.array(np.zeros(len(t), np.int64)),
            "tf": pa.array(np.zeros(len(t), np.int64)),
            "c2": pa.array(np.zeros(len(t), np.int64)),
            "c1": t.column("c1"),
            "side": pa.array(np.zeros(len(t), np.int64))}),
        batch_format="pyarrow", batch_size=65536)
    # no batch_size here either: step1's partition callback emits whole-
    # partition row-expanded outputs; coalesce in map_key_partitions below
    e2 = step1.map_batches(
        lambda t: pa.table({
            "w1": t.column("w1"), "d": t.column("d"),
            "tf": t.column("tf"), "c2": t.column("c2"),
            "c1": pa.array(np.zeros(len(t), np.int64)),
            "side": pa.array(np.ones(len(t), np.int64))}),
        batch_format="pyarrow")

    def score_partial(part: pa.Table) -> pa.Table:
        keys = part.column("w1").to_numpy(zero_copy_only=False)
        if not len(keys):
            return pa.table({"d": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        side = part.column("side").to_numpy(zero_copy_only=False)
        c1v = part.column("c1").to_numpy(zero_copy_only=False)
        starts = segment_starts(keys)
        lens = segment_lengths(starts, len(keys))
        seg_c1 = np.where(side[starts] == 0, c1v[starts], 0)
        full_c1 = np.repeat(seg_c1, lens)
        mask = side == 1
        d = part.column("d").to_numpy(zero_copy_only=False)[mask]
        tf = part.column("tf").to_numpy(
            zero_copy_only=False)[mask].astype(np.float64)
        c2v = part.column("c2").to_numpy(
            zero_copy_only=False)[mask].astype(np.float64)
        c1m = full_c1[mask].astype(np.float64)
        lp = np.log((c2v + 1.0) / (c1m + float(vocab_v)))
        ud, inv = np.unique(d, return_inverse=True)
        return pa.table({
            "d": pa.array(ud, pa.int64()),
            "s": pa.array(np.bincount(inv, weights=tf * lp,
                                      minlength=len(ud)), pa.float64()),
            "n": pa.array(np.bincount(inv, weights=tf,
                                      minlength=len(ud)).astype(np.int64),
                          pa.int64())})

    partials = map_key_partitions(u2.union(e2), "w1", score_partial,
                                  num_buckets=num_buckets,
                                  sort_cols=["side"],
                                  coalesce_rows=65536,
                                  producer_expands=True)
    agg = hash_agg(partials, "d", [("s", "sum", "s"),
                                   ("n", "sum", "n")])

    def finish(t: pa.Table) -> pa.Table:
        s = t.column("s").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        nll = -s / n
        return pa.table({
            id_column: t.column("d"),
            "n_bigrams": pc.cast(t.column("n"), pa.int64()),
            "nll": pa.array(np.floor(nll * 1e4 + 0.5) / 1e4, pa.float64())})

    return agg.map_batches(finish, batch_format="pyarrow")
