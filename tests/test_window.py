"""Arrow-native per-key window stage (stages/window.py): the
hash-partitioned segment-kernel path must agree exactly with a
straightforward per-key pandas reference."""

import numpy as np
import pandas as pd
import pyarrow as pa

from magic_content_extractor_ray.stages.window import (
    map_key_partitions, segment_starts, segment_lengths)


def test_segment_kernels():
    keys = np.array([3, 3, 3, 7, 9, 9])
    starts = segment_starts(keys)
    assert starts.tolist() == [0, 3, 4]
    assert segment_lengths(starts, len(keys)).tolist() == [3, 1, 2]
    assert segment_starts(np.array([])).tolist() == []


def test_map_key_partitions_matches_pandas_reference(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    n, k = 5000, 400
    df = pd.DataFrame({
        "key": rng.randint(0, k, n).astype(np.int64),
        "ts": rng.randint(0, 10**9, n).astype(np.int64),
        "val": rng.randint(0, 100, n).astype(np.int64),
    })

    GAP = 10**7

    def sessions_arrow(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        starts = segment_starts(key)
        new_key = np.zeros(len(t), dtype=bool)
        new_key[starts] = True
        is_start = new_key.copy()
        is_start[1:] |= (ts[1:] - ts[:-1]) > GAP
        return pa.table({
            "key": pa.array(key[starts]),
            "n_sessions": pa.array(
                np.add.reduceat(is_start.astype(np.int64), starts),
                pa.int64()),
            "n_rows": pa.array(
                segment_lengths(starts, len(t)), pa.int64()),
        })

    got = map_key_partitions(
        rd.from_pandas(df).repartition(7), "key", sessions_arrow,
        sort_cols=["ts"], num_buckets=16,
    ).to_pandas().sort_values("key").reset_index(drop=True)

    # reference: plain per-key pandas
    rows = []
    for key, g in df.sort_values(["key", "ts"]).groupby("key"):
        ts = g["ts"].to_numpy()
        rows.append({"key": key,
                     "n_sessions": int((np.diff(ts) > GAP).sum()) + 1,
                     "n_rows": len(g)})
    want = pd.DataFrame(rows).sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"key": np.int64}), want.astype({"key": np.int64}))
    # every key appears exactly once → no key straddled two partitions
    assert got["key"].is_unique


def test_map_key_partitions_string_keys(ray_session):
    """String keys route through the polars vectorized hash bucket path;
    key-completeness per partition must still hold."""
    import ray.data as rd

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "key": [f"user-{i}" for i in rng.randint(0, 120, 2000)],
        "v": rng.randint(0, 1000, 2000).astype(np.int64),
    })

    def per_key_sum(t: pa.Table) -> pa.Table:
        key = np.asarray(t.column("key").to_pylist())
        v = t.column("v").to_numpy(zero_copy_only=False)
        starts = segment_starts(key)
        return pa.table({
            "key": pa.array(key[starts]),
            "total": pa.array(np.add.reduceat(v, starts), pa.int64()),
        })

    got = map_key_partitions(
        rd.from_pandas(df).repartition(5), "key", per_key_sum,
        num_buckets=8,
    ).to_pandas().sort_values("key").reset_index(drop=True)
    want = df.groupby("key", as_index=False)["v"].sum().rename(
        columns={"v": "total"}).sort_values("key").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert got["key"].is_unique


def test_hash_agg_matches_ray_groupby(ray_session):
    """hash_agg == groupby().aggregate() on every fn, including composite
    groups and null handling (min ignores nulls like Ray's Min)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min, Sum
    from magic_content_extractor_ray.stages.window import hash_agg

    rng = np.random.RandomState(11)
    n = 5000
    rows = [{"k": int(rng.randint(0, 1500)), "k2": int(rng.randint(0, 3)),
             "v": float(rng.randn()),
             "o": None if i % 7 == 0 else int(rng.randint(0, 100))}
            for i in range(n)]
    ds = rd.from_items(rows).repartition(7)

    got = hash_agg(ds, "k", [("v", "sum", "s"), ("v", "min", "mn"),
                             ("v", "max", "mx"), ("o", "min", "omin"),
                             ("v", "count_all", "n")]).to_pandas(
        ).sort_values("k").reset_index(drop=True)
    exp = ds.groupby("k").aggregate(
        Sum("v", alias_name="s"), Min("v", alias_name="mn"),
        Max("v", alias_name="mx"), Min("o", alias_name="omin"),
        Count(alias_name="n")).to_pandas().sort_values("k").reset_index(
        drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got[["k", "mn", "mx", "omin", "n"]],
                                  exp[["k", "mn", "mx", "omin", "n"]],
                                  check_dtype=False)
    assert np.allclose(got["s"], exp["s"])

    # composite groups hash-partitioned on the first key
    got2 = hash_agg(ds, "k", [("v", "sum", "s")],
                    group_cols=["k", "k2"]).to_pandas().sort_values(
        ["k", "k2"]).reset_index(drop=True)
    exp2 = ds.groupby(["k", "k2"]).aggregate(
        Sum("v", alias_name="s")).to_pandas().sort_values(
        ["k", "k2"]).reset_index(drop=True)
    assert list(got2.columns) == list(exp2.columns)
    assert np.allclose(got2["s"], exp2["s"])
