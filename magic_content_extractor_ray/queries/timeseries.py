"""Revenue/time-series queries: moving stats, seasonality, change detection.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _bincount_i64, _read_pq  # noqa: F401


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
