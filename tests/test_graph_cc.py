"""Connected components (dup-cluster formation) vs a union-find oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from jschon_ray.functions.graph import connected_components, dup_clusters


def uf_components(pairs):
    """Pure-python union-find oracle: node -> min node of its component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots = {}
    for n in list(parent):
        roots.setdefault(find(n), []).append(n)
    out = {}
    for members in roots.values():
        rep = min(members)
        for n in members:
            out[n] = rep
    return out


def run_cc(pairs, **kw):
    df = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    ds = ray.data.from_pandas(df).repartition(4)
    res = connected_components(ds, **kw).to_pandas()
    return dict(zip(res["node"], res["component"]))


# every small graph here exercises BOTH execution paths: the in-memory
# fast path (small_edge_limit default) and the distributed
# pointer-doubling loop (small_edge_limit=None)
BOTH_PATHS = pytest.mark.parametrize(
    "limit", [2_000_000, None], ids=["local", "distributed"])


@BOTH_PATHS
def test_two_components_int(ray_session, limit):
    got = run_cc([(1, 2), (2, 3), (10, 11)], small_edge_limit=limit)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


@BOTH_PATHS
def test_long_chain_needs_propagation_rounds(ray_session, limit):
    # a 40-node path: exercises multi-round propagation (pointer-doubling
    # shortcuts make this O(log diameter) rounds)
    pairs = [(i, i + 1) for i in range(40)]
    got = run_cc(pairs, num_buckets=8, small_edge_limit=limit)
    assert got == {i: 0 for i in range(41)}


@BOTH_PATHS
def test_string_ids_lexicographic_min(ray_session, limit):
    got = run_cc([("doc-b", "doc-c"), ("doc-c", "doc-a"),
                  ("zzz", "yyy")], small_edge_limit=limit)
    assert got == {"doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
                   "zzz": "yyy", "yyy": "yyy"}


@BOTH_PATHS
def test_self_loops_and_duplicate_edges(ray_session, limit):
    got = run_cc([(5, 5), (1, 2), (2, 1), (1, 2)],
                 small_edge_limit=limit)
    assert got == {5: 5, 1: 1, 2: 1}


@BOTH_PATHS
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_vs_union_find(ray_session, seed, limit):
    rng = np.random.default_rng(seed)
    n = 200
    m = int(rng.integers(50, 300))
    pairs = [(int(a), int(b))
             for a, b in rng.integers(0, n, size=(m, 2))]
    got = run_cc(pairs, num_buckets=16, small_edge_limit=limit)
    assert got == uf_components(pairs)


def test_diameter_budget_raises(ray_session):
    pairs = [(i, i + 1) for i in range(30)]
    df = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    ds = ray.data.from_pandas(df)
    with pytest.raises(RuntimeError, match="did not converge"):
        # round budget only applies to the distributed loop; the local
        # fast path always converges in one in-memory pass
        connected_components(ds, max_rounds=3,
                             small_edge_limit=None).to_pandas()


def test_dup_clusters_keep_rule(ray_session):
    pairs = pd.DataFrame({"id_a": [1, 2, 7], "id_b": [2, 3, 8]})
    ds = ray.data.from_pandas(pairs)
    res = dup_clusters(ds, id_name="doc_id").to_pandas()
    keep = set(res.loc[res["doc_id"] == res["component"], "doc_id"])
    assert keep == {1, 7}


@BOTH_PATHS
def test_null_endpoint_edges_dropped(ray_session, limit):
    """Edges with a NULL endpoint carry no connectivity: both paths
    drop them identically (the local path would otherwise factorize
    None to -1 and fabricate an edge onto the last-ranked node)."""
    t = pa.table({
        "id_a": pa.array([1, 10, None, 1], pa.int64()),
        "id_b": pa.array([2, 11, 1, None], pa.int64())})
    import pyarrow as _pa
    res = connected_components(ray.data.from_arrow(t),
                               small_edge_limit=limit).to_pandas()
    got = dict(zip(res["node"], res["component"]))
    assert got == {1: 1, 2: 1, 10: 10, 11: 10}
