"""Seeded-random fuzz: round-2 distributed ops vs brute-force numpy/
pandas references on shuffled, repartitioned inputs (the partitioning
must never leak into results)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SEEDS = [11, 23, 47]


def _ds(t, seed):
    import ray.data

    return ray.data.from_arrow(t).random_shuffle(seed=seed) \
        .repartition(5)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_triangle_count(seed):
    from jschon_ray.functions.graph import triangle_count

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 30, 120
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    t = pa.table({"id_a": pa.array(a, pa.int64()),
                  "id_b": pa.array(b, pa.int64())})
    got = triangle_count(_ds(t, seed), num_buckets=8).iloc[0]

    # brute force over the adjacency matrix
    adj = np.zeros((n_nodes, n_nodes), bool)
    keep = a != b
    adj[a[keep], b[keep]] = True
    adj[b[keep], a[keep]] = True
    m = int(np.triu(adj).sum())
    tri = int(np.trace(adj.astype(np.int64) @ adj @ adj) // 6)
    assert got["n_edges"] == m
    assert got["n_triangles"] == tri
    assert got["n_nodes"] == int(adj.any(axis=0).sum())


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_skyline(seed):
    from jschon_ray.functions.relational import skyline_2d

    rng = np.random.default_rng(seed)
    n = 300
    price = rng.integers(0, 40, n).astype(np.float64)
    size = rng.integers(0, 40, n).astype(np.int64)
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()),
                  "price": pa.array(price),
                  "size": pa.array(size)})
    got = set(skyline_2d(_ds(t, seed), min_col="price",
                         max_col="size", keep_cols=("id",))["id"])

    expect = set()
    for i in range(n):
        dominated = np.any(
            (price <= price[i]) & (size >= size[i])
            & ((price < price[i]) | (size > size[i])))
        if not dominated:
            expect.add(i)
    assert got == expect


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_interval_coverage(seed):
    from jschon_ray.functions.windows import keyed_interval_coverage

    rng = np.random.default_rng(seed)
    n = 400
    k = rng.integers(0, 12, n)
    lo = rng.integers(0, 1000, n).astype(np.int64)
    hi = lo + rng.integers(1, 200, n)
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "lo": pa.array(lo), "hi": pa.array(hi)})
    got = keyed_interval_coverage(_ds(t, seed), key_col="k",
                                  lo_col="lo", hi_col="hi",
                                  num_buckets=4).to_pandas() \
        .set_index("k").sort_index()

    for key in np.unique(k):
        ivs = sorted(zip(lo[k == key], hi[k == key]))
        merged = []
        for a, b in ivs:
            if merged and a <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], b)
            else:
                merged.append([a, b])
        assert got.loc[key, "n_windows"] == len(merged)
        assert got.loc[key, "covered"] == sum(b - a for a, b in merged)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_key_gaps(seed):
    from jschon_ray.functions.scan import key_gaps

    rng = np.random.default_rng(seed)
    keys = rng.choice(np.arange(0, 3000), size=250, replace=True)
    t = pa.table({"k": pa.array(keys, pa.int64())})
    got = key_gaps(_ds(t, seed), key_col="k").to_pandas() \
        .sort_values("gap_lo").reset_index(drop=True)

    u = np.unique(keys)
    d = np.diff(u)
    idx = np.flatnonzero(d > 1)
    expect = pd.DataFrame({
        "gap_lo": u[idx] + 1, "gap_hi": u[idx + 1] - 1,
        "gap_len": d[idx] - 1}).astype("int64")
    pd.testing.assert_frame_equal(
        got[["gap_lo", "gap_hi", "gap_len"]].astype("int64"), expect)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_streaks(seed):
    from jschon_ray.functions.windows import keyed_streaks

    rng = np.random.default_rng(seed)
    n = 300
    k = rng.integers(0, 8, n)
    day = rng.integers(0, 25, n)
    ts = (np.datetime64("2024-01-01", "us")
          + day * np.timedelta64(86_400_000_000, "us")
          + rng.integers(0, 86_400_000_000, n)
          .astype("timedelta64[us]"))
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))})
    got = keyed_streaks(_ds(t, seed), key_col="k", ts_col="ts",
                        num_buckets=4).to_pandas() \
        .set_index("k").sort_index()

    for key in np.unique(k):
        days = np.unique(day[k == key])
        runs = np.split(days, np.flatnonzero(np.diff(days) != 1) + 1)
        assert got.loc[key, "max_streak"] == max(len(r) for r in runs)
        assert got.loc[key, "n_active_units"] == len(days)
        assert got.loc[key, "n_streaks"] == len(runs)


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_transition_counts(seed):
    from jschon_ray.functions.windows import keyed_transition_counts

    rng = np.random.default_rng(seed)
    n = 400
    k = rng.integers(0, 10, n)
    types = np.array(["a", "b", "c"], dtype=object)[
        rng.integers(0, 3, n)]
    ts = (np.datetime64("2024-01-01", "us")
          + rng.permutation(n).astype("timedelta64[us]") * 1_000_000)
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us")),
                  "tie": pa.array(np.arange(n), pa.int64()),
                  "typ": pa.array(types, pa.string())})
    got = keyed_transition_counts(
        _ds(t, seed), key_col="k", ts_col="ts", tie_col="tie",
        type_col="typ", num_buckets=4)
    got_map = {(r.cur_type, r.next_type): r.n
               for r in got.itertuples()}

    df = pd.DataFrame({"k": k, "ts": ts, "tie": np.arange(n),
                       "typ": types}).sort_values(["k", "ts", "tie"])
    expect: dict = {}
    kk = df["k"].to_numpy()
    tt = df["typ"].to_numpy()
    for i in range(len(df) - 1):
        if kk[i] == kk[i + 1]:
            key = (tt[i], tt[i + 1])
            expect[key] = expect.get(key, 0) + 1
    assert got_map == expect


def test_empty_inputs_do_not_crash():
    """Every round-2 operator must survive an empty (0-row) input —
    empty blocks arise naturally after filters (ADVICE r1 flagged this
    class for pca_fit)."""
    import ray.data

    from jschon_ray.functions.graph import pagerank, triangle_count
    from jschon_ray.functions.relational import skyline_2d
    from jschon_ray.functions.scan import key_gaps
    from jschon_ray.functions.windows import (cohort_retention_matrix,
                                              keyed_ewma,
                                              keyed_interval_coverage,
                                              keyed_streaks,
                                              keyed_transition_counts)

    empty_edges = ray.data.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64())}))
    tri = triangle_count(empty_edges, num_buckets=4)
    assert tri.iloc[0]["n_triangles"] == 0
    assert len(pagerank(empty_edges, iters=3)) == 0

    empty_iv = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "lo": pa.array([], pa.int64()),
        "hi": pa.array([], pa.int64())}))
    assert keyed_interval_coverage(empty_iv, key_col="k", lo_col="lo",
                                   hi_col="hi",
                                   num_buckets=2).count() == 0
    assert key_gaps(ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64())})),
        key_col="k").count() == 0

    empty_ev = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "tie": pa.array([], pa.int64()),
        "typ": pa.array([], pa.string()),
        "v": pa.array([], pa.float64())}))
    assert keyed_streaks(empty_ev, key_col="k", ts_col="ts",
                         num_buckets=2).count() == 0
    assert len(keyed_transition_counts(
        empty_ev, key_col="k", ts_col="ts", tie_col="tie",
        type_col="typ", num_buckets=2)) == 0
    assert len(cohort_retention_matrix(empty_ev, key_col="k",
                                       ts_col="ts",
                                       num_buckets=2)) == 0
    assert keyed_ewma(empty_ev, key_col="k", ts_col="ts",
                      tie_col="tie", value_col="v",
                      num_buckets=2).count() == 0

    empty_sk = ray.data.from_arrow(pa.table({
        "id": pa.array([], pa.int64()),
        "price": pa.array([], pa.float64()),
        "size": pa.array([], pa.int64())}))
    assert len(skyline_2d(empty_sk, min_col="price", max_col="size",
                          keep_cols=("id",))) == 0
