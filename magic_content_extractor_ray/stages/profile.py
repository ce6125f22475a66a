"""Data-quality profiling stages (the Deequ / TFDV shape): before a
100 TB corpus is trained on, it is profiled — per-column completeness /
cardinality, and per-group distributional outlier counts. Both
operators reduce to bounded state (per-column counters, per-group
integer sufficient statistics); neither ever holds raw rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def table_profile(ds, columns: list[str]):
    """Per-column profile: (column, n_rows, n_nulls, n_distinct) — the
    completeness/cardinality summary a data-validation suite asserts
    against. n_distinct is EXACT (SQL ``count(DISTINCT x)`` semantics,
    nulls excluded): per-batch distinct partials → one hash_agg per
    column whose shuffle volume is O(distinct values), then a count.
    For unbounded-cardinality columns at corpus scale, swap the exact
    pass for ``sketch.approx_distinct_by_group`` (HLL) — the null/row
    counters are a single combiner pass either way. Returns a Dataset
    with one row per profiled column."""
    import ray.data as rd

    from .window import hash_agg

    def null_partial(batch: pa.Table) -> pa.Table:
        rows = {"n_rows": [len(batch)]}
        for c in columns:
            rows[f"nulls_{c}"] = [batch.column(c).null_count]
        return pa.table(rows)

    counters = ds.select_columns(columns).map_batches(
        null_partial, batch_format="pyarrow").sum(
        ["n_rows"] + [f"nulls_{c}" for c in columns])

    out_rows = []
    for c in columns:
        def distinct_partial(batch: pa.Table, col=c) -> pa.Table:
            v = batch.column(col)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            u = pc.unique(v.drop_null())
            return pa.table({col: u})

        n_distinct = hash_agg(
            ds.select_columns([c]).map_batches(
                distinct_partial, batch_format="pyarrow"),
            c, [(c, "count_all", "n")]).count()
        out_rows.append({
            "column": c,
            "n_rows": int(counters["sum(n_rows)"]),
            "n_nulls": int(counters[f"sum(nulls_{c})"]),
            "n_distinct": int(n_distinct),
        })
    return rd.from_arrow(pa.Table.from_pylist(out_rows))


def grouped_value_outliers(ds, *, key_column: str, value_column: str,
                           sigmas: float = 2.0, decimals: int = 2):
    """Per-group z-score outlier counts: rows where
    ``|v − mean| > sigmas·stddev_pop`` of the row's group — the
    data-quality anomaly screen run before ingestion. Two passes, both
    bounded: (1) per-group integer sufficient statistics (n, Σv, Σv²)
    over fixed-point values (``decimals`` digits — exact for currency /
    metric readings; Σv² stays inside int64 up to ~4e9 rows per group
    at 2 decimals; beyond that, shard groups and merge the partials as
    Python ints), combined map-side so the shuffle is one row per
    (batch, group); (2) a broadcast of the tiny (group → mean, cutoff)
    table into a map-side filter. Both engines derive mean/σ from
    IDENTICAL integers with the identical float64 expression, so the
    counts are bit-for-bit SQL-checkable. NULL values are ignored.
    Returns (key, n, n_outliers)."""
    import ray

    from ray.data.aggregate import Sum

    scale = 10 ** decimals

    def stats_partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_column, value_column]).drop_null()
        v = np.round(t.column(value_column).to_numpy(
            zero_copy_only=False) * scale).astype(np.int64)
        t = pa.table({key_column: t.column(key_column),
                      "v": pa.array(v, pa.int64()),
                      "vv": pa.array(v * v, pa.int64()),
                      "one": pa.array(np.ones(len(v), np.int64))})
        g = t.group_by([key_column]).aggregate(
            [("one", "sum"), ("v", "sum"), ("vv", "sum")])
        return pa.table({key_column: g.column(key_column),
                         "n": pc.cast(g.column("one_sum"), pa.int64()),
                         "sv": pc.cast(g.column("v_sum"), pa.int64()),
                         "svv": pc.cast(g.column("vv_sum"), pa.int64())})

    stats = ds.map_batches(stats_partial, batch_format="pyarrow").groupby(
        key_column).aggregate(Sum("n", alias_name="n"),
                              Sum("sv", alias_name="sv"),
                              Sum("svv", alias_name="svv")).take_all()
    # group → (mean, cutoff) in fixed-point units; tiny (one row per
    # group), broadcast once
    cuts = {}
    for r in stats:
        n, sv, svv = r["n"], r["sv"], r["svv"]
        mean = sv * 1.0 / n
        var = max(svv * 1.0 / n - mean * mean, 0.0)
        cuts[r[key_column]] = (mean, sigmas * np.sqrt(var), n)
    cuts_ref = ray.put(cuts)

    def count_outliers(batch: pa.Table) -> pa.Table:
        table = ray.get(cuts_ref)
        t = batch.select([key_column, value_column]).drop_null()
        keys = t.column(key_column).to_numpy(zero_copy_only=False)
        v = np.round(t.column(value_column).to_numpy(
            zero_copy_only=False) * scale).astype(np.int64)
        out_k, out_c = [], []
        # vectorize per group present in the batch (group count is small)
        for k in np.unique(keys):
            mean, cutoff, _ = table[k]
            sel = v[keys == k]
            out_k.append(k)
            out_c.append(int(np.count_nonzero(
                np.abs(sel - mean) > cutoff)))
        return pa.table({key_column: pa.array(out_k),
                         "n_outliers": pa.array(out_c, pa.int64())})

    from .window import hash_agg

    per_batch = ds.map_batches(count_outliers, batch_format="pyarrow")
    agg = hash_agg(per_batch, key_column,
                   [("n_outliers", "sum", "n_outliers")])

    def attach_n(t: pa.Table) -> pa.Table:
        table = ray.get(cuts_ref)
        ns = [table[k][2] for k in t.column(key_column).to_pylist()]
        return t.append_column("n", pa.array(ns, pa.int64()))

    return agg.map_batches(attach_n, batch_format="pyarrow")


def grouped_mad_outliers(ds, *, key_column: str, value_column: str,
                         k: int = 5, decimals: int = 2):
    """Per-group ROBUST outlier counts: rows where
    ``|v − median| > k·MAD`` of the row's group (MAD = median absolute
    deviation). The z-score screen (``grouped_value_outliers``) is
    itself corrupted by the outliers it hunts — one 1e9 reading
    inflates σ until nothing else trips; median/MAD have a 50%
    breakdown point, which is why data-validation suites pair both.

    EXACT and fully integer: values are fixed-point at ``decimals``
    digits; ONE distributed pass builds the per-(group, value) count
    histogram (state O(distinct values per group), the
    ``grouped_quantiles`` trick — a single hash_agg shuffle), and the
    per-group finisher derives everything from that histogram with no
    second data pass: median (doubled → integer m2 even when
    interpolated), the deviation histogram d = |2v − m2| by folding
    symmetric values together, its median (doubled → integer m4 =
    4·MAD), and the outlier count as the histogram mass where
    ``2·d > k·m4`` — an all-integer comparison, so both engines agree
    bit-for-bit. MAD = 0 (>50% of a group identical) degenerates to
    "any deviation is an outlier", the standard MAD-screen behavior.
    NULL values are ignored. Returns
    (key, n, median, mad, n_outliers); median/mad are float64 halves /
    quarters, exactly representable."""
    import pandas as pd

    from .window import hash_agg

    scale = 10 ** decimals

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([key_column, value_column]).drop_null()
        v = np.round(t.column(value_column).to_numpy(
            zero_copy_only=False) * scale).astype(np.int64)
        g = pa.table({key_column: t.column(key_column),
                      "v": pa.array(v, pa.int64())}).group_by(
            [key_column, "v"]).aggregate([([], "count_all")])
        return pa.table({key_column: g.column(key_column),
                         "v": g.column("v"),
                         "cnt": pc.cast(g.column("count_all"), pa.int64())})

    hist = hash_agg(ds.map_batches(partial, batch_format="pyarrow"),
                    key_column, [("cnt", "sum", "cnt")],
                    group_cols=[key_column, "v"])

    def med2(vals: np.ndarray, cnts: np.ndarray) -> int:
        """2× the interpolated median of a sorted value histogram —
        integral (median of ints is k or k+0.5)."""
        cum = cnts.cumsum()
        n = int(cum[-1])
        lo_rank, hi_rank = (n - 1) // 2, n // 2
        lo = int(vals[np.searchsorted(cum, lo_rank + 1, side="left")])
        hi = int(vals[np.searchsorted(cum, hi_rank + 1, side="left")])
        return lo + hi

    def per_key(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("v").reset_index(drop=True)
        vals = g["v"].to_numpy(dtype=np.int64)
        cnts = g["cnt"].to_numpy(dtype=np.int64)
        n = int(cnts.sum())
        m2 = med2(vals, cnts)
        # fold the value histogram into the |2v − m2| histogram
        d = np.abs(2 * vals - m2)
        order = np.argsort(d, kind="stable")
        d, dc = d[order], cnts[order]
        uniq, start = np.unique(d, return_index=True)
        dcnt = np.add.reduceat(dc, start)
        m4 = med2(uniq, dcnt)
        n_out = int(dcnt[2 * uniq > k * m4].sum())
        return pd.DataFrame({
            key_column: [g[key_column].iloc[0]],
            "n": np.array([n], np.int64),
            "median": [m2 / 2.0 / scale],
            "mad": [m4 / 4.0 / scale],
            "n_outliers": np.array([n_out], np.int64)})

    return hist.groupby(key_column).map_groups(
        per_key, batch_format="pandas")
