"""triangle_count and pagerank: known-graph truth + reference parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _edges(pairs):
    return pa.table({"id_a": pa.array([p[0] for p in pairs], pa.int64()),
                     "id_b": pa.array([p[1] for p in pairs], pa.int64())})


def test_triangle_count_k4_plus_tail():
    import ray.data

    from jschon_ray.functions.graph import triangle_count

    # K4 on {1,2,3,4} has C(4,3)=4 triangles; tail 4-5-6 adds none.
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 6),
             (2, 1), (3, 1)]          # duplicates/reversals collapse
    ds = ray.data.from_arrow(_edges(pairs)).repartition(3)
    out = triangle_count(ds, num_buckets=8)
    r = out.iloc[0]
    assert r["n_nodes"] == 6
    assert r["n_edges"] == 8
    assert r["n_triangles"] == 4


def test_triangle_count_triangle_free():
    import ray.data

    from jschon_ray.functions.graph import triangle_count

    # 4-cycle: exactly one oriented wedge (1 -> {2,4}), no triangles.
    # (A star would give ZERO oriented wedges — the degree ordering
    # sends every edge leaf->center, which is exactly the point.)
    pairs = [(1, 2), (2, 3), (3, 4), (1, 4)]
    ds = ray.data.from_arrow(_edges(pairs)).repartition(2)
    out = triangle_count(ds, num_buckets=4)
    assert out.iloc[0]["n_triangles"] == 0
    assert out.iloc[0]["n_wedges"] == 1


def _pagerank_reference(pairs, n_nodes, damping=0.85, iters=10):
    """Dense power iteration, same dangling handling."""
    nodes = sorted({x for p in pairs for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    nv = len(nodes)
    out = np.zeros(nv)
    for s, _ in pairs:
        out[idx[s]] += 1
    r = np.full(nv, 1.0 / nv)
    for _ in range(iters):
        contrib = np.zeros(nv)
        for s, d in pairs:
            contrib[idx[d]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / nv + damping * (contrib + dangling / nv)
    return pd.DataFrame({"node": nodes, "rank": r})


def test_pagerank_matches_dense_reference():
    import ray.data

    from jschon_ray.functions.graph import pagerank

    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 4),
             (5, 1)]                       # 5 is dangling-free; 2->3 hub
    ds = ray.data.from_arrow(_edges(pairs)).repartition(3)
    got = pagerank(ds, iters=12, decimals=10) \
        .sort_values("node").reset_index(drop=True)
    ref = _pagerank_reference(pairs, 5, iters=12) \
        .sort_values("node").reset_index(drop=True)
    np.testing.assert_allclose(got["rank"], ref["rank"], atol=1e-9)
    assert abs(got["rank"].sum() - 1.0) < 1e-6


def test_pagerank_dangling_mass():
    import ray.data

    from jschon_ray.functions.graph import pagerank

    # 2 is a sink (dangling): mass must still sum to 1
    pairs = [(1, 2), (3, 2)]
    ds = ray.data.from_arrow(_edges(pairs))
    got = pagerank(ds, iters=15, decimals=10)
    assert abs(got["rank"].sum() - 1.0) < 1e-6
    ranks = dict(zip(got["node"], got["rank"]))
    assert ranks[2] > ranks[1]


def test_pagerank_dataset_matches_driver_variant(ray_session):
    """Dataset-resident ranks == broadcast-vector ranks, bit-for-bit
    at the rounding precision, including dangling redistribution."""
    import ray.data

    from jschon_ray.functions.graph import pagerank, pagerank_dataset

    pairs = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 4),
             (5, 1), (6, 6), (1, 2)]   # self-loop + duplicate edge
    ds = ray.data.from_arrow(_edges(pairs)).repartition(3)
    drv = pagerank(ds, iters=12, decimals=10) \
        .sort_values("node").reset_index(drop=True)
    res = pagerank_dataset(ds, iters=12, decimals=10, num_buckets=4) \
        .to_pandas().sort_values("node").reset_index(drop=True)
    np.testing.assert_array_equal(drv["node"], res["node"])
    np.testing.assert_allclose(drv["rank"], res["rank"], atol=1e-9)
    assert abs(res["rank"].sum() - 1.0) < 1e-6


def test_pagerank_dataset_dangling_mass(ray_session):
    import ray.data

    from jschon_ray.functions.graph import pagerank_dataset

    pairs = [(1, 2), (3, 2)]           # 2 is a sink
    ds = ray.data.from_arrow(_edges(pairs))
    got = pagerank_dataset(ds, iters=15, decimals=10).to_pandas()
    assert abs(got["rank"].sum() - 1.0) < 1e-6
    ranks = dict(zip(got["node"], got["rank"]))
    assert ranks[2] > ranks[1]


def test_triangle_count_join_mode_parity(ray_session):
    """degree_mode='join' (shuffle-attached degrees, no broadcast) ==
    degree_mode='broadcast' on the same graph."""
    import ray.data

    from jschon_ray.functions.graph import triangle_count

    rng = np.random.default_rng(11)
    a = rng.integers(0, 60, 400)
    b = rng.integers(0, 60, 400)
    ds = ray.data.from_arrow(_edges(list(zip(a, b)))).repartition(3)
    bc = triangle_count(ds, num_buckets=8)
    jn = triangle_count(ds, num_buckets=8, degree_mode="join")
    pd.testing.assert_frame_equal(bc, jn)
    assert bc.iloc[0]["n_triangles"] > 0
