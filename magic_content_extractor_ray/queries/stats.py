"""Statistics: grouped quantiles, hypothesis tests, calibration, inequality and selection.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _batch_topk, _bincount_i64, _read_pq, _ws_split_lists  # noqa: F401


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

def q_distinct_users_approx(sf_dir: str):
    """Approximate per-group distinct count via mergeable HyperLogLog
    sketches (2^12 registers per batch on the wire, never the values) —
    the unbounded-cardinality twin of the exact `distinct_users` oracle
    query. Rows-only: the estimate is within the ±~1.6% HLL band of the
    exact counts — asserted IN-QUERY on every run against an exact
    distinct recount (one combiner groupby; group count is tiny), in
    addition to test_grouped_hll."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from magic_content_extractor_ray.stages.sketch import (
        approx_distinct_by_group)
    from magic_content_extractor_ray.stages.window import hash_agg

    out = approx_distinct_by_group(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["event_type", "user_id"]),
        "event_type", "user_id").sort("event_type").to_pandas()

    def pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        return g.append_column(
            "one", pa.array([1] * len(g), pa.int64()))

    exact = hash_agg(
        _read_pq(f"{sf_dir}/events.parquet",
                 columns=["event_type", "user_id"]).map_batches(
            pairs, batch_format="pyarrow"),
        "event_type", [("one", "sum", "n_exact")],
        group_cols=["event_type", "user_id"]).to_pandas()
    exact = exact.groupby("event_type").size()
    for et, est in zip(out["event_type"], out["approx_distinct"]):
        true = int(exact[et])
        if abs(int(est) - true) > max(8, 0.05 * true):
            raise AssertionError(
                f"HLL estimate {est} for {et} outside the 5% band of "
                f"exact {true}")
    return out

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
