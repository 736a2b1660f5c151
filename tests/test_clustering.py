"""Distributed k-means vs ground-truth blobs and a local Lloyd oracle."""

import pyarrow as pa
import numpy as np
import pandas as pd
import pytest
import ray.data

from jschon_ray.functions.clustering import kmeans_assign, kmeans_fit


def blobs(seed=0, n=3000, d=8, k=3, spread=0.3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5.0, size=(k, d))
    lab = rng.integers(0, k, n)
    x = centers[lab] + rng.normal(0, spread, size=(n, d))
    return x, lab, centers


def to_ds(x, ids=None, blocks=6):
    df = pd.DataFrame({
        "vec_id": ids if ids is not None else np.arange(len(x)),
        "embedding": [row.tolist() for row in x]})
    return ray.data.from_pandas(df).repartition(blocks)


def test_recovers_separated_blobs(ray_session):
    x, lab, _ = blobs()
    ds = to_ds(x)
    cents, info = kmeans_fit(ds, k=3, seed=7, sample_size=512)
    out = kmeans_assign(ds, cents, id_col="vec_id").to_pandas() \
        .sort_values("vec_id")
    got = out["cluster"].to_numpy()
    # cluster labels are arbitrary: check purity via majority mapping
    purity = sum(np.bincount(got[lab == c]).max() for c in range(3)) \
        / len(lab)
    assert purity > 0.99
    assert info["counts"].sum() == len(x)


def test_inertia_monotone_nonincreasing(ray_session):
    x, _, _ = blobs(seed=5, spread=2.0)
    cents, info = kmeans_fit(to_ds(x), k=4, seed=1, max_iters=8,
                             tol=0.0, sample_size=256)
    inert = info["inertia"]
    assert all(b <= a + 1e-6 for a, b in zip(inert, inert[1:]))


def test_deterministic_given_seed(ray_session):
    x, _, _ = blobs(seed=2)
    c1, _ = kmeans_fit(to_ds(x), k=3, seed=9, max_iters=5)
    c2, _ = kmeans_fit(to_ds(x), k=3, seed=9, max_iters=5)
    assert np.allclose(np.sort(c1, axis=0), np.sort(c2, axis=0))


def test_assign_distances_are_euclidean(ray_session):
    x = np.array([[0.0, 0.0], [3.0, 4.0]])
    cents = np.array([[0.0, 0.0], [10.0, 10.0]])
    out = kmeans_assign(to_ds(x, blocks=1), cents, id_col="vec_id") \
        .to_pandas().sort_values("vec_id")
    assert out["cluster"].tolist() == [0, 0]
    assert np.allclose(out["dist"].to_numpy(), [0.0, 5.0])


class TestPCA:
    def test_matches_full_numpy_pca(self, ray_session):
        import ray.data
        rng = np.random.default_rng(7)
        # anisotropic gaussian so components are well separated
        x = (rng.normal(0, 1, (300, 6))
             * np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.1])).astype(
                 np.float32)
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(300), pa.int64()),
            "embedding": pa.array(list(x))}))
        from jschon_ray.functions.clustering import pca_fit, \
            pca_transform
        m = pca_fit(ds, vec_col="embedding", n_components=3)
        xf = x.astype(np.float64)
        cov = np.cov(xf, rowvar=False, bias=True)
        evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
        assert np.allclose(m["explained_variance"], evals[:3],
                           rtol=1e-8)
        assert np.allclose(m["explained_variance_ratio"].sum(),
                           evals[:3].sum() / evals.sum(), rtol=1e-8)
        # components are orthonormal
        c = m["components"]
        assert np.allclose(c @ c.T, np.eye(3), atol=1e-10)
        # projection variance per component equals the eigenvalue
        z = pca_transform(ds, m, id_col="vec_id").to_pandas()
        zm = np.stack(z.sort_values("vec_id")["pc"].to_numpy())
        assert np.allclose(zm.var(axis=0, ddof=0),
                           m["explained_variance"], rtol=1e-4)

    def test_partials_split_invariance(self, ray_session):
        import ray.data
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (100, 4)).astype(np.float32)
        t = pa.table({"vec_id": pa.array(np.arange(100), pa.int64()),
                      "embedding": pa.array(list(x))})
        from jschon_ray.functions.clustering import pca_fit
        one = pca_fit(ray.data.from_arrow(t), n_components=2)
        many = pca_fit(
            ray.data.from_arrow(t).repartition(7), n_components=2)
        assert np.allclose(one["explained_variance"],
                           many["explained_variance"], rtol=1e-9)
        assert np.allclose(one["components"], many["components"],
                           atol=1e-9)


class TestLinearProbe:
    def test_matches_numpy_ridge(self, ray_session):
        import ray.data
        rng = np.random.default_rng(11)
        n, d, k = 240, 5, 3
        centers = rng.normal(0, 4, (k, d))
        y = rng.integers(0, k, n)
        x = (centers[y] + rng.normal(0, 1, (n, d))).astype(np.float32)
        ds = ray.data.from_arrow(pa.table({
            "embedding": pa.array(list(x)),
            "label": pa.array(y.astype(np.int32))})).repartition(5)
        from jschon_ray.functions.clustering import (
            linear_probe_fit, linear_probe_score)
        m = linear_probe_fit(ds, ridge=1e-3)
        # reference: full-batch closed form
        xf = np.concatenate([x.astype(np.float64),
                             np.ones((n, 1))], axis=1)
        yh = np.zeros((n, k)); yh[np.arange(n), y] = 1.0
        reg = 1e-3 * n * np.eye(d + 1); reg[-1, -1] = 0.0
        w_ref = np.linalg.solve(xf.T @ xf + reg, xf.T @ yh)
        assert np.allclose(m["W"], w_ref, rtol=1e-8, atol=1e-10)
        s = linear_probe_score(ds, m)
        pred = np.argmax(xf @ w_ref, axis=1)
        assert s["correct"] == int((pred == y).sum())
        assert s["accuracy"] > 0.8  # separable clusters
