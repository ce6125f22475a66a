"""DuckDB-oracle equality inside the pytest gate: a fast subset of the
SQL-expressible queries compared at sf0.001 (the full set runs in
tools/check_correctness.py at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
FAST = ["dedup_exact", "token_count", "quality_counts", "lang_stats",
        "top_docs", "long_docs", "source_stats", "events_by_type",
        "lineitem_pricing", "event_props", "events_by_segment",
        "user_sessions", "asof_join", "orders_by_segment", "ann_topk",
        "user_paths", "event_gaps", "running_order_total", "events_pivot",
        "users_intersect", "purchase_days_clean", "suppliers_by_region",
        "orders_monthly", "lineitem_corr", "label_centroids",
        "tfidf_terms", "active_days", "chars_quartiles", "heavy_terms",
        "token_offsets", "sample_fixed", "orders_cube", "sample_per_lang",
        "daily_view_purchase", "lang_chars_var",
        "customers_with_purchases", "embedding_norms", "doc_char_rank",
        "epoch_shuffle", "brand_revenue", "event_value_totals",
        "recent_orders", "top_terms_per_lang", "session_durations",
        "doc_chunks", "chunk_dedup", "docs_decontaminated",
        "split_assignments", "supplier_ship_volumes", "ann_filtered",
        "covisitation", "centroid_assign", "quality_percentile",
        "inverted_index", "revenue_forecast", "promo_revenue",
        "customer_distribution", "top_supplier", "idle_customer_balance",
        "nation_trade_volume", "market_share", "returned_items",
        "pareto_orders", "item_bfs", "pricing_summary", "readability",
        "weighted_median", "conversion_lag", "source_ks",
        "event_transitions", "rfm_segments", "classifier_auc",
        "dedup_overlap", "benford_digits", "stickiness",
        "revenue_autocorr", "lang_source_chi2", "small_qty_revenue", "brand_band_revenue",
        "item_neighbors", "session_bounds", "revenue_concentration",
        "item_components",
        "cheapest_supplier", "product_profit", "important_parts",
        "shipmode_priority", "part_supplier_variety",
        "promotion_suppliers", "qty_price_slope", "k_anonymity",
        "segment_ttest", "event_bursts", "event_debounce",
        "link_prediction", "revenue_trend_mk", "revenue_ewma",
        "event_trigrams", "ltv_cohort_curve", "lang_chars_moments",
        "degree_assortativity", "scd2_history", "event_rle",
        "media_dimensions", "zonemap_prune", "funnel_1h",
        "kcore_items", "mutual_nn", "monthly_seasonality",
        "assoc_triples", "jaccard_histogram", "survival_km",
        "late_events", "ndcg_eval", "nucleus_vocab", "phrase_search",
        "title_entity_clusters", "popularity_hitrate", "ht_estimate",
        "bootstrap_ci", "index_compression", "hll_twin", "cdc_chunks",
        "lang_cross_entropy", "zipf_slope", "burst_viterbi",
        "audio_metadata", "item_cheapest_path", "edge_churn",
        "l_diversity", "dup_spans", "pca_power", "random_walks",
        "negative_samples", "decayed_popularity", "mst_coview",
        "textrank_keywords", "label_propagation", "hard_negatives",
        "dedup_safe_folds", "quantile_normalize", "hbos_outliers",
        "conformal_interval", "token_waterfill", "mmr_select",
        "length_emd", "isotonic_calibration", "curriculum_order",
        "padding_waste", "rank_rbo",
        "clustering_coefficient", "markov_stationary",
        "join_cardinality_model", "oov_rate", "pps_systematic",
        "hill_tail", "gini_split", "term_burstiness",
        "coverage_select", "curation_pipeline", "good_turing",
        "join_order_costs", "shapley_coverage", "modularity",
        "runs_test", "heaps_fit", "lead_lag", "video_framesample",
        "jonckheere", "james_stein", "lttb_downsample",
        "sprt_crossing", "lis_revenue", "voptimal_histogram",
        "knapsack_sources", "theil_index"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", FAST)
def test_oracle_equality(name, duck, ray_session):
    import __ray_entry__ as entrymod

    got = entrymod.queries()[name](SF_DIR)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = duck.sql(entrymod.oracle_sql()[name]).df()
    g, e = _norm(got), _norm(exp)
    assert list(g.columns) == list(e.columns)
    assert len(g) == len(e)
    pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                  check_exact=False, rtol=1e-9)


def test_doc_chunks_multichunk(duck, ray_session, tmp_path):
    """The multi-chunk path (absent from the short-doc corpus) matches
    DuckDB token-list slicing on synthetic long documents."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    rng = random.Random(0)
    rows = [{"doc_id": i,
             "text": " ".join(f"w{rng.randrange(100)}"
                              for _ in range(rng.randrange(1, 500))),
             "lang": "en", "source": "s", "n_chars": 1}
            for i in range(60)]
    rows.append({"doc_id": 999, "text": "", "lang": "en", "source": "s",
                 "n_chars": 0})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), f"{sf}/documents.parquet")

    got = entrymod.queries()["doc_chunks"](sf).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf}/documents.parquet')")
    exp = con.sql(entrymod.oracle_sql()["doc_chunks"]).df()
    g = got.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    e = exp.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert g.groupby("doc_id").size().max() > 1  # multi-chunk exercised
    pd.testing.assert_frame_equal(g, e, check_dtype=False)


def test_source_drift_kl_hand_computed(ray_session, tmp_path):
    """KL over a tiny corpus matches a direct float computation, and a
    skewed source scores strictly higher drift than a corpus-like one."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    # balanced: 2×"a b c"; skewed: "a a a a a b"  (vocab ≪ K=200)
    rows = [
        {"doc_id": 0, "text": "a b c", "lang": "en", "source": "bal",
         "n_chars": 5},
        {"doc_id": 1, "text": "a b c", "lang": "en", "source": "bal",
         "n_chars": 5},
        {"doc_id": 2, "text": "a a a a a b", "lang": "en",
         "source": "skew", "n_chars": 11},
    ]
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), f"{sf}/documents.parquet")

    got = entrymod.queries()["source_drift_kl"](sf).to_pandas()
    got = got.set_index("source")

    # global: a=7 b=3 c=2, nv=12
    glob = {"a": 7, "b": 3, "c": 2}
    nv = 12
    per_src = {"bal": {"a": 2, "b": 2, "c": 2},
               "skew": {"a": 5, "b": 1}}

    for s, cnts in per_src.items():
        nsv = sum(cnts.values())
        kl = 0
        for t, c in cnts.items():
            x = (c / nsv) * math.log((c * nv) / (nsv * glob[t]))
            kl += int(math.copysign(math.floor(abs(x) * 1e9 + 0.5), x))
        assert got.loc[s, "n"] == nsv
        assert got.loc[s, "kl"] == kl / 1e9
    assert got.loc["skew", "kl"] > got.loc["bal", "kl"] > 0


def test_cumulative_users_multiday(ray_session, tmp_path):
    """Returning users never recount; the curve accumulates only
    first-appearances — exercised over 4 synthetic days (the sf corpus
    spans just 2)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    base = dt.datetime(2024, 3, 1)
    ev = []   # (day_offset, user): u1 d0,d1,d3; u2 d0; u3 d1; u4 d3
    for day, user in [(0, 1), (1, 1), (3, 1), (0, 2), (1, 3), (3, 4)]:
        ev.append({"event_id": len(ev), "user_id": user,
                   "ts": base + dt.timedelta(days=day, minutes=user),
                   "event_type": "view", "value": 1.0, "props": "{}"})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(ev), f"{sf}/events.parquet")

    got = entrymod.queries()["cumulative_users"](sf).to_pandas()
    d0 = (base - dt.datetime(1970, 1, 1)).days
    assert got["day_bucket"].tolist() == [d0, d0 + 1, d0 + 3]
    assert got["new_users"].tolist() == [2, 1, 1]
    assert got["cum_users"].tolist() == [2, 3, 4]


def test_segment_gini_hand_computed(ray_session, tmp_path):
    """Gini from the histogram finisher matches hand arithmetic: an
    equal segment scores 0, a whale segment 0.72; ties exercise the
    c·cum + c(c+1)/2 rank-sum path; multi-order customers sum first."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    # eq: 4 customers spending 2.00 each (one via two 1.00 orders)
    # whale: spends 1,1,1,97 → G = (2·394 − 5·100)/400 = 0.72
    orders, cust = [], []
    for ck, seg, amounts in [
        (1, "eq", [1.0, 1.0]), (2, "eq", [2.0]), (3, "eq", [2.0]),
        (4, "eq", [2.0]),
        (5, "wh", [1.0]), (6, "wh", [1.0]), (7, "wh", [1.0]),
        (8, "wh", [97.0]),
    ]:
        cust.append({"c_custkey": ck, "c_mktsegment": seg})
        for a in amounts:
            orders.append({"o_orderkey": len(orders), "o_custkey": ck,
                           "o_totalprice": a})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(orders), f"{sf}/orders.parquet")
    pq.write_table(pa.Table.from_pylist(cust), f"{sf}/customer.parquet")

    got = entrymod.queries()["segment_gini"](sf).to_pandas()
    got = got.set_index("segment")
    assert got.loc["eq", "n"] == 4 and got.loc["eq", "gini"] == 0.0
    assert got.loc["wh", "n"] == 4 and got.loc["wh", "gini"] == 0.72


def test_dense_rank_docs_ties(ray_session, tmp_path):
    """DENSE_RANK semantics: tied lengths all keep the same rank and
    ties do not consume rank slots (4 distinct lengths → only top 3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    rows = []
    # en lengths: 100×2 (dr1), 90 (dr2), 80×3 (dr3), 70 (cut)
    for i, n in enumerate([100, 100, 90, 80, 80, 80, 70]):
        rows.append({"doc_id": i, "text": "x", "lang": "en",
                     "source": "s", "n_chars": n})
    rows.append({"doc_id": 99, "text": "x", "lang": "de",
                 "source": "s", "n_chars": 5})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), f"{sf}/documents.parquet")

    got = entrymod.queries()["dense_rank_docs"](sf).to_pandas()
    en = got[got["lang"] == "en"].sort_values("doc_id")
    assert en["doc_id"].tolist() == [0, 1, 2, 3, 4, 5]   # 70 cut
    assert en["dr"].tolist() == [1, 1, 2, 3, 3, 3]
    de = got[got["lang"] == "de"]
    assert de["dr"].tolist() == [1]                      # short group


def test_concurrent_sessions_endpoint_inclusive(ray_session, tmp_path):
    """A session that starts exactly when another ends overlaps it
    (inclusive endpoints → concurrency 2); disjoint sessions don't;
    the per-day max lands on the start point's day."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    mk = lambda uid, mins: {
        "event_id": uid * 100 + mins, "user_id": uid,
        "ts": base + dt.timedelta(minutes=mins),
        "event_type": "view", "value": 1.0, "props": "{}"}
    ev = [
        mk(1, 0), mk(1, 10),          # u1 session [0, 10]
        mk(2, 10),                    # u2 session [10, 10] — touches u1
        mk(3, 200),                   # u3 far later, alone (same day)
        # next day: three overlapping singles at the same minute
        mk(4, 1440), mk(5, 1440), mk(6, 1440),
    ]
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(ev), f"{sf}/events.parquet")

    got = entrymod.queries()["concurrent_sessions"](sf).to_pandas()
    got = got.sort_values("day_bucket").reset_index(drop=True)
    assert got["max_concurrent"].tolist() == [2, 3]


def test_bpe_pairs_hand_computed(ray_session, tmp_path):
    """Adjacent-pair counts on a tiny corpus match hand counting,
    including the count-desc/pair-asc tie-break and Unicode pairs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    rows = [
        {"doc_id": 0, "text": "ABAB", "lang": "en", "source": "s",
         "n_chars": 4},      # lower: abab → ab×2, ba×1
        {"doc_id": 1, "text": "ab", "lang": "en", "source": "s",
         "n_chars": 2},      # ab×1  → ab total 3
        {"doc_id": 2, "text": "x", "lang": "en", "source": "s",
         "n_chars": 1},      # too short: nothing
        {"doc_id": 3, "text": "héé", "lang": "fr", "source": "s",
         "n_chars": 3},      # hé×1, éé×1 (code-point pairs)
    ]
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), f"{sf}/documents.parquet")

    got = entrymod.queries()["bpe_pairs"](sf).to_pandas()
    by = dict(zip(got["pair"], got["n"]))
    assert by == {"ab": 3, "ba": 1, "hé": 1, "éé": 1}
    assert got[got["pair"] == "ab"]["rnk"].iloc[0] == 1
    # ties (n=1) ranked by code-point order: ba < hé < éé
    assert got.sort_values("rnk")["pair"].tolist() == [
        "ab", "ba", "hé", "éé"]


def test_weekly_churn_transitions(ray_session, tmp_path):
    """Hand-built activity pattern: a user active in consecutive weeks
    is retained, a gap week churns them for that week, and the final
    observed week is excluded (its next week is unobservable)."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    def at_week(w, uid):
        # epoch-week w (ts inside that week), unique event ids
        base = dt.datetime(1970, 1, 1) + dt.timedelta(weeks=w, hours=uid)
        return {"event_id": w * 1000 + uid, "user_id": uid, "ts": base,
                "event_type": "view", "value": 1.0, "props": "{}"}

    W = 2800  # some epoch week
    ev = [
        # u1: W, W+1, W+2  → retained at W and W+1
        at_week(W, 1), at_week(W + 1, 1), at_week(W + 2, 1),
        # u2: W, W+2       → churned at W (gap), W+2 is last week (cut)
        at_week(W, 2), at_week(W + 2, 2),
        # u3: W+1 only     → churned at W+1
        at_week(W + 1, 3),
    ]
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(ev), f"{sf}/events.parquet")

    got = entrymod.queries()["weekly_churn"](sf).to_pandas()
    got = got.set_index("week")
    assert got.index.tolist() == [W, W + 1]          # W+2 excluded
    assert got.loc[W].to_dict() == {
        "active": 2, "retained": 1, "churned": 1}     # u1 ret, u2 churn
    assert got.loc[W + 1].to_dict() == {
        "active": 2, "retained": 1, "churned": 1}     # u1 ret, u3 churn


def test_stickiness_multimonth(ray_session, tmp_path):
    """DAU/MAU over 3 synthetic months (the sf corpus spans one):
    repeat users count once per day and once per month; stickiness_ppm
    floors avg-DAU/MAU exactly."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    base = dt.datetime(2024, 1, 1)
    ev = []
    # Jan: u1 active on 2 days, u2 on 1 day (2 days present)
    #   -> user_days=3, n_days=2, mau=2 -> 3e6 // (2*2) = 750000
    # Feb: u1,u2,u3 all on one day -> 3e6 // (1*3) = 1000000
    # Mar: u1 on 3 days, u4 on 1 of them (3 days present)
    #   -> user_days=4, mau=2 -> 4e6 // (3*2) = 666666
    plan = [(0, 1), (0, 1), (1, 1), (0, 2),          # Jan (dup same day)
            (31, 1), (31, 2), (31, 3),               # Feb
            (60, 1), (61, 1), (62, 1), (61, 4)]      # Mar
    for day, user in plan:
        ev.append({"event_id": len(ev), "user_id": user,
                   "ts": base + dt.timedelta(days=day, minutes=len(ev)),
                   "event_type": "view", "value": 1.0, "props": "{}"})
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(ev), f"{sf}/events.parquet")

    got = entrymod.queries()["stickiness"](sf)
    assert got["month"].tolist() == ["2024-01", "2024-02", "2024-03"]
    assert got["user_days"].tolist() == [3, 3, 4]
    assert got["n_days"].tolist() == [2, 1, 3]
    assert got["mau"].tolist() == [2, 3, 2]
    assert got["stickiness_ppm"].tolist() == [750000, 1000000, 666666]


def test_event_bursts_kernel_differential(ray_session, tmp_path):
    """The composite-key two-searchsorted burst kernel matches an O(n²)
    brute force on random multi-user traffic (ties included), and the
    window endpoint is inclusive (an event exactly 60 s later counts)."""
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entrymod

    rng = np.random.default_rng(7)
    base = dt.datetime(2024, 5, 1)
    ev = []
    truth = {}
    for user in range(1, 9):
        n = int(rng.integers(3, 40))
        # second-resolution offsets force ties and exact-60s boundaries
        offs = np.sort(rng.integers(0, 300, size=n))
        best = 0
        for t in offs:
            best = max(best, int(((offs >= t) & (offs <= t + 60)).sum()))
        truth[user] = best
        for o in offs:
            ev.append({"event_id": len(ev), "user_id": user,
                       "ts": base + dt.timedelta(seconds=int(o)),
                       "event_type": "view", "value": 1.0, "props": "{}"})
    # u9: exactly-60s pair -> inclusive frame counts both
    for o in (0, 60):
        ev.append({"event_id": len(ev), "user_id": 9,
                   "ts": base + dt.timedelta(seconds=o),
                   "event_type": "view", "value": 1.0, "props": "{}"})
    truth[9] = 2
    sf = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(ev), f"{sf}/events.parquet")

    got = entrymod.queries()["event_bursts"](sf)
    assert dict(zip(got["user_id"], got["max_burst"])) == truth
