import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from magic_content_extractor_ray.stages.pagerank import pagerank


def dense_pagerank(edges_df, damping=0.85, n_iter=10):
    """Dense numpy reference: same simple recurrence (no dangling
    redistribution), parallel edges summed."""
    agg = edges_df.groupby(["src", "dst"], as_index=False).size()
    nodes = np.array(sorted(set(agg["src"]) | set(agg["dst"])), np.int64)
    idx = {n: i for i, n in enumerate(nodes)}
    nv = len(nodes)
    w = np.zeros((nv, nv))
    for s, d, c in agg.itertuples(index=False):
        w[idx[s], idx[d]] = c
    out = w.sum(axis=1)
    p = np.divide(w, out[:, None], out=np.zeros_like(w),
                  where=out[:, None] > 0)
    r = np.full(nv, 1.0 / nv)
    for _ in range(n_iter):
        r = (1 - damping) / nv + damping * (r @ p)
    return pd.DataFrame({"node": nodes, "rank": r})


@pytest.fixture(scope="module")
def graph_df():
    rng = np.random.RandomState(7)
    n_edges = 3000
    df = pd.DataFrame({
        "src": rng.randint(0, 80, n_edges).astype(np.int64),
        "dst": rng.randint(0, 80, n_edges).astype(np.int64),
    })
    # a few sink nodes (no out-edges) and a source-only node
    df = df[~df["src"].isin([3, 5])].reset_index(drop=True)
    return df


def test_pagerank_broadcast_matches_dense(ray_session, graph_df):
    import ray.data as rd

    got = pagerank(rd.from_pandas(graph_df).repartition(6),
                   n_iter=10).to_pandas()
    want = dense_pagerank(graph_df, n_iter=10)
    merged = got.merge(want, on="node", suffixes=("_g", "_w"))
    assert len(merged) == len(want) == len(got)
    np.testing.assert_allclose(merged["rank_g"], merged["rank_w"],
                               rtol=1e-12, atol=1e-14)
    # ranks are a distribution up to the un-redistributed dangling mass
    assert got["rank"].sum() <= 1.0 + 1e-9


def test_pagerank_streaming_matches_local(ray_session, graph_df):
    """Above the counted edge bound the power iteration streams the
    edge list per round; results must agree with the driver-local
    fast path to FP noise."""
    import ray.data as rd

    ds = rd.from_pandas(graph_df).repartition(6)
    local = pagerank(ds, n_iter=4).to_pandas()
    streamed = pagerank(ds, n_iter=4, max_driver_edges=0).to_pandas()
    merged = local.merge(streamed, on="node", suffixes=("_l", "_s"))
    assert len(merged) == len(local) == len(streamed)
    np.testing.assert_allclose(merged["rank_l"], merged["rank_s"],
                               rtol=1e-12, atol=1e-14)


def test_pagerank_join_mode_matches_broadcast(ray_session, graph_df):
    import ray.data as rd

    ds = rd.from_pandas(graph_df).repartition(6)
    b = pagerank(ds, n_iter=3).to_pandas()
    j = pagerank(ds, n_iter=3, mode="join",
                 num_buckets=8).to_pandas().sort_values(
        "node").reset_index(drop=True)
    merged = b.merge(j, on="node", suffixes=("_b", "_j"))
    assert len(merged) == len(b) == len(j)
    np.testing.assert_allclose(merged["rank_b"], merged["rank_j"],
                               rtol=1e-12, atol=1e-14)


def test_pagerank_weighted_edges(ray_session):
    """An explicit weight column must equal the same graph given as
    expanded parallel edges."""
    import ray.data as rd

    wdf = pd.DataFrame({"src": [0, 0, 1, 2], "dst": [1, 2, 2, 0],
                        "w": [3, 1, 2, 5]})
    exp = wdf.loc[wdf.index.repeat(wdf["w"])].drop(columns="w")
    got_w = pagerank(rd.from_pandas(wdf), weight="w", n_iter=8).to_pandas()
    got_e = pagerank(rd.from_pandas(exp), n_iter=8).to_pandas()
    np.testing.assert_allclose(got_w["rank"], got_e["rank"], rtol=1e-12)


def test_pagerank_broadcast_bound(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"src": np.arange(10, dtype=np.int64),
                       "dst": np.arange(1, 11, dtype=np.int64)})
    with pytest.raises(ValueError, match="join"):
        pagerank(rd.from_pandas(df), max_broadcast_nodes=5)
