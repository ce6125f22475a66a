"""Distributed byte-pair-encoding tokenizer training.

BPE (Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016) trains on the word-TYPE table — distinct
words with corpus counts — not the token stream: types are orders of
magnitude fewer than tokens, and every merge decision only needs pair
counts weighted by type frequency. That makes the corpus-scale part
(word counting) one tokenize + hash_agg pass, and each merge round a
cheap distributed sweep over the type table:

  round r:
    1. map_batches over the (syms, cnt) type table → per-block partial
       pair counts (one combiner table per block);
    2. hash_agg sums partials per pair;
    3. per-block top-1 + a driver final pick selects the best pair
       (count desc, then lexicographic (left, right) asc —
       deterministic across schedulers);
    4. one map_batches applies the merge to every type's symbol list,
       materialized for the next round (the per-round materialize
       pattern of the k-means / BFS / pagerank loops).

Per-round shuffle volume is O(distinct pairs), never O(corpus).

Semantics pinned by ``bpe_train_reference`` (the single-process oracle
used by the differential tests): pair counts are per POSITION (the word
type "aaa" contributes ("a","a") twice per occurrence), and a merge is
applied greedily left-to-right without overlap ("aaa" + merge (a,a) →
["aa", "a"]).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SEP = "\x00"  # joins (left, right) into one shuffle key; never in text


def _pair_counts_block(syms_lists, cnts) -> dict:
    counts: dict[str, int] = {}
    for syms, cnt in zip(syms_lists, cnts):
        c = int(cnt)
        for i in range(len(syms) - 1):
            k = syms[i] + SEP + syms[i + 1]
            counts[k] = counts.get(k, 0) + c
    return counts


def _merge_word(syms: list, left: str, right: str) -> list:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(ds, *, column: str = "text", num_merges: int = 30,
              lowercase: bool = True,
              driver_types_bound: int = 1_000_000):
    """Train ``num_merges`` BPE merges over ``ds[column]``.

    Returns a list of dicts (rank, left, right, pair_count) — the merge
    table in learned order. Stops early when no adjacent pair remains.
    """
    from .window import hash_agg

    def word_counts(batch: pa.Table) -> pa.Table:
        import re

        ws_re = re.compile(r"\S+", re.ASCII)
        words: list[str] = []
        for t in batch.column(column).to_pylist():
            t = (t or "")
            if lowercase:
                t = t.lower()
            words.extend(ws_re.findall(t))
        tb = pa.table({"word": pa.array(words, pa.string())})
        g = tb.group_by("word").aggregate([([], "count_all")])
        return pa.table({"word": g.column("word"),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    types = hash_agg(
        ds.map_batches(word_counts, batch_format="pyarrow",
                       batch_size=256),
        "word", [("cnt", "sum", "cnt")], producer_expands=True)

    def seed(t: pa.Table) -> pa.Table:
        syms = [list(w) for w in t.column("word").to_pylist()]
        return pa.table({
            "syms": pa.array(syms, pa.list_(pa.string())),
            "cnt": t.column("cnt")})

    # the word-TYPE table is vocab-scale (≪ corpus): compact the 64
    # hash_agg output blocks to a handful before the per-round loop, so
    # each of the num_merges rounds launches ~8 map tasks instead of 64
    # (per-round wall is fixed-cost-dominated at this size; 0.9 → 0.35
    # s/round at sf0.1)
    table = types.map_batches(seed, batch_format="pyarrow"
                              ).repartition(8).materialize()

    # counted driver fast path (the connected-components hybrid
    # precedent): below the bound, every distributed round is PURE
    # fixed cost — two Ray executions over a vocab-scale table (31
    # word types at sf0.1 cost ~1 s/round). Pull (syms, cnt) once and
    # run the identical merge loop locally; the distributed rounds
    # below remain the path for vocabularies past driver memory.
    if table.count() <= driver_types_bound:
        rows = table.take_all()
        syms = [list(r["syms"]) for r in rows]
        cnts = [int(r["cnt"]) for r in rows]
        merges_l: list[dict] = []
        for rank in range(num_merges):
            counts = _pair_counts_block(syms, cnts)
            if not counts:
                break
            pair, n_best = min(counts.items(),
                               key=lambda kv: (-kv[1], kv[0]))
            left, right = pair.split(SEP)
            merges_l.append({"rank": rank, "left": left,
                             "right": right,
                             "pair_count": int(n_best)})
            syms = [_merge_word(s, left, right) for s in syms]
        return merges_l

    merges: list[dict] = []
    for rank in range(num_merges):
        def pair_partial(t: pa.Table) -> pa.Table:
            counts = _pair_counts_block(
                t.column("syms").to_pylist(),
                t.column("cnt").to_pylist())
            return pa.table({
                "pair": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64())})

        # the pair vocabulary is VOCAB-bounded (pairs of subword
        # symbols over word TYPES — never corpus-scale), so the 8
        # per-block partial count tables merge on the driver: one
        # execution per round instead of the former pair hash_agg +
        # per-block top-1 round trip (sf0.1: ~44 s → ~22 s for 40
        # merges; integer sums, so the merge order is irrelevant)
        parts = table.map_batches(pair_partial,
                                  batch_format="pyarrow").take_all()
        agg: dict[str, int] = {}
        for r in parts:
            agg[r["pair"]] = agg.get(r["pair"], 0) + int(r["n"])
        if not agg:
            break
        pair, n_best = min(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        left, right = pair.split(SEP)
        merges.append({"rank": rank, "left": left, "right": right,
                       "pair_count": int(n_best)})

        def apply_merge(t: pa.Table, *, _l=left, _r=right) -> pa.Table:
            syms = [_merge_word(s, _l, _r)
                    for s in t.column("syms").to_pylist()]
            return pa.table({
                "syms": pa.array(syms, pa.list_(pa.string())),
                "cnt": t.column("cnt")})

        table = table.map_batches(
            apply_merge, batch_format="pyarrow").materialize()
    return merges


def bpe_encode_word(word: str, merges: list[dict]) -> list[str]:
    """Apply a learned merge table to one word, in rank order (the
    standard greedy encode; shared by tests and the reference)."""
    syms = list(word)
    for m in merges:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, m["left"], m["right"])
    return syms


def bpe_train_reference(texts, num_merges: int = 30,
                        lowercase: bool = True) -> list[dict]:
    """Single-process oracle with identical semantics (per-position
    pair counts, greedy non-overlapping merge, (count desc, pair asc)
    tie-break) for the differential tests."""
    import re

    ws_re = re.compile(r"\S+", re.ASCII)
    word_cnt: dict[str, int] = {}
    for t in texts:
        t = (t or "")
        if lowercase:
            t = t.lower()
        for w in ws_re.findall(t):
            word_cnt[w] = word_cnt.get(w, 0) + 1

    types = {w: list(w) for w in word_cnt}
    merges: list[dict] = []
    for rank in range(num_merges):
        counts: dict[tuple, int] = {}
        for w, syms in types.items():
            c = word_cnt[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (left, right), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append({"rank": rank, "left": left, "right": right,
                       "pair_count": int(n)})
        types = {w: _merge_word(s, left, right) for w, s in types.items()}
    return merges
