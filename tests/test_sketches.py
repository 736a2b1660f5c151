"""Sketch correctness: accuracy bounds, mergeability, serialization."""

import numpy as np

from jschon_ray.state.sketches import (
    CountMinSketch,
    Histogram,
    HyperLogLog,
    TDigest,
    hash_array,
    ks_statistic,
    psi,
)


def test_tdigest_quantiles_accuracy():
    rng = np.random.default_rng(0)
    data = rng.normal(100, 15, 50_000)
    td = TDigest()
    for chunk in np.array_split(data, 37):
        td.add_batch(chunk)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        exact = np.quantile(data, q)
        approx = td.quantile(q)
        assert abs(approx - exact) < 1.0, (q, exact, approx)


def test_tdigest_merge_equals_single():
    rng = np.random.default_rng(1)
    data = rng.exponential(10, 30_000)
    parts = np.array_split(data, 8)
    merged = TDigest()
    for p in parts:
        merged.merge(TDigest().add_batch(p))
    single = TDigest().add_batch(data)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert abs(merged.quantile(q) - single.quantile(q)) \
            < 0.05 * max(1, single.quantile(q))
    assert merged.count == len(data)


def test_tdigest_roundtrip():
    td = TDigest().add_batch(np.arange(1000.0))
    td2 = TDigest.from_bytes(td.to_bytes())
    assert abs(td2.quantile(0.5) - td.quantile(0.5)) < 1e-9
    assert td2.count == 1000


def test_hll_estimate_and_merge():
    a = HyperLogLog()
    b = HyperLogLog()
    a.add_batch([f"user-{i}" for i in range(30_000)])
    b.add_batch([f"user-{i}" for i in range(20_000, 60_000)])
    est_a = a.estimate()
    assert abs(est_a - 30_000) / 30_000 < 0.03
    a.merge(b)
    assert abs(a.estimate() - 60_000) / 60_000 < 0.03
    c = HyperLogLog.from_bytes(a.to_bytes())
    assert c.estimate() == a.estimate()


def test_hll_small_range_linear_counting():
    h = HyperLogLog()
    h.add_batch([f"k{i}" for i in range(50)])
    assert abs(h.estimate() - 50) <= 2


def test_countmin_frequencies():
    cm = CountMinSketch()
    keys = ["hot"] * 7000 + [f"cold-{i}" for i in range(3000)]
    cm.add_batch(keys)
    est = cm.query(["hot"])[0]
    assert 7000 <= est <= 7000 + 0.01 * cm.n
    cm2 = CountMinSketch()
    cm2.add_batch(["hot"] * 1000)
    cm.merge(cm2)
    assert cm.query(["hot"])[0] >= 8000
    cm3 = CountMinSketch.from_bytes(cm.to_bytes())
    assert (cm3.query(["hot"]) == cm.query(["hot"])).all()


def test_histogram_and_psi():
    edges = np.linspace(0, 100, 11)
    rng = np.random.default_rng(2)
    base = Histogram(edges).add_batch(rng.uniform(0, 100, 20_000))
    same = Histogram(edges).add_batch(rng.uniform(0, 100, 20_000))
    shifted = Histogram(edges).add_batch(rng.uniform(30, 130, 20_000))
    assert psi(base, same) < 0.02
    assert psi(base, shifted) > 0.25
    m = Histogram.from_bytes(base.to_bytes()).merge(same)
    assert m.counts.sum() == 40_000


def test_ks_statistic():
    rng = np.random.default_rng(3)
    a = TDigest().add_batch(rng.normal(0, 1, 20_000))
    b = TDigest().add_batch(rng.normal(0, 1, 20_000))
    c = TDigest().add_batch(rng.normal(1.0, 1, 20_000))
    assert ks_statistic(a, b) < 0.05
    assert ks_statistic(a, c) > 0.3


def test_hash_array_stable():
    h1 = hash_array(["a", "b", "c"])
    h2 = hash_array(["a", "b", "c"])
    assert (h1 == h2).all()
    assert len(set(h1.tolist())) == 3
