"""Event-stream queries: sessions, windows, funnels, attribution.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _EVENT_TYPES, _batch_topk, _pool, _read_pq  # noqa: F401


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
