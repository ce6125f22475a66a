"""TPC-H-shaped relational queries over orders/lineitem/customer/supplier/part.

Split from the original __ray_entry__ monolith (round-5 verdict item 3);
bodies are unchanged — oracle hashes and goldens are preserved.
"""
from __future__ import annotations

from ._common import _batch_topk, _pool, _read_pq  # noqa: F401


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
