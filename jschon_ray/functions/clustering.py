"""Distributed k-means over an embedding column (list<float>).

Embedding-space clustering is a core curation primitive at training-data
scale (cluster-balanced sampling, semantic dedup, domain discovery); the
same structure backs the IVF index in `functions/similarity.py` (which
trains driver-side on a sample — this module is the full-data path).

Shape (SURVEY §4 "broadcast small sides / pre-aggregate partials"):

  init      deterministic k-means++ on a driver-side seeded sample
  iterate   broadcast the (k x d) centroid matrix via `ray.put` (read by
            every task, shipped once); ONE map_batches computes per-block
            partial (per-cluster vector sums, counts, inertia) — a
            (k x d + k + 1)-number blob per block, two-level reduced
            (repartition -> per-partition sum) so the driver never sees
            O(num_blocks) rows; driver updates centroids
  assign    one final broadcast pass emits (id, cluster, dist)

The input is never shuffled — every exchange is O(k x d) per block.
Empty clusters keep their previous centroid (documented; at corpus scale
k-means++ over a large sample makes them rare). No jschon analogue
(SURVEY §2.9 new-design operator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _batch_matrix(t: pa.Table, vec_col: str) -> np.ndarray:
    """(n, d) float64 view of a fixed-dim list<float> column."""
    col = t[vec_col].combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    n = len(col)
    if n == 0:
        return flat.reshape(0, 0)
    return flat.reshape(n, len(flat) // n)


def _assign(x: np.ndarray, cents: np.ndarray):
    """Nearest centroid per row: vectorized ||x-c||^2 via one matmul."""
    d2 = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ cents.T) \
        + (cents * cents).sum(axis=1)
    lab = np.argmin(d2, axis=1)
    return lab, np.maximum(d2[np.arange(len(x)), lab], 0.0)


def _kmeanspp(sample: np.ndarray, k: int, rng) -> np.ndarray:
    cents = [sample[rng.integers(len(sample))]]
    for _ in range(1, k):
        d2 = np.min(
            ((sample[:, None, :] - np.asarray(cents)[None, :, :]) ** 2)
            .sum(axis=2), axis=1)
        p = d2 / d2.sum() if d2.sum() > 0 else None
        cents.append(sample[rng.choice(len(sample), p=p)])
    return np.asarray(cents, dtype=np.float64)


def kmeans_fit(ds, *, vec_col: str = "embedding", k: int = 8,
               max_iters: int = 20, tol: float = 1e-6, seed: int = 42,
               sample_size: int = 4096, reduce_parallelism: int = 16):
    """Lloyd's k-means; returns (centroids (k,d) float64, info dict with
    per-iteration inertia). The embedding column is materialized once so
    iterations re-read object-store blocks, not the upstream pipeline."""
    import ray

    narrow = ds.select_columns([vec_col]).materialize()
    sample = _batch_matrix(
        pa.Table.from_pandas(narrow.limit(sample_size).to_pandas()),
        vec_col)
    rng = np.random.default_rng(seed)
    cents = _kmeanspp(sample, k, rng)
    d = cents.shape[1]
    inertia_log = []

    for _it in range(max_iters):
        ref = ray.put(cents)

        def partial(t: pa.Table, ref=ref) -> pa.Table:
            import ray as _ray

            c = _ray.get(ref) if isinstance(ref, _ray.ObjectRef) else ref
            x = _batch_matrix(t, vec_col)
            if x.shape[0] == 0:
                z = np.zeros(k * d + k + 1)
                return pa.table({"blob": pa.array([z.tolist()],
                                                  pa.list_(pa.float64()))})
            lab, d2 = _assign(x, c)
            sums = np.zeros((k, d))
            np.add.at(sums, lab, x)
            counts = np.bincount(lab, minlength=k).astype(np.float64)
            blob = np.concatenate([sums.ravel(), counts, [d2.sum()]])
            return pa.table({"blob": pa.array([blob.tolist()],
                                              pa.list_(pa.float64()))})

        def combine(t: pa.Table) -> pa.Table:
            m = np.vstack([np.asarray(r) for r in
                           t["blob"].to_pylist()]).sum(axis=0)
            return pa.table({"blob": pa.array([m.tolist()],
                                              pa.list_(pa.float64()))})

        parts = narrow.map_batches(partial, batch_format="pyarrow") \
            .repartition(reduce_parallelism) \
            .map_batches(combine, batch_format="pyarrow").to_pandas()
        total = np.vstack([np.asarray(r) for r in parts["blob"]]) \
            .sum(axis=0)
        sums = total[:k * d].reshape(k, d)
        counts = total[k * d:k * d + k]
        inertia_log.append(float(total[-1]))
        new = np.where(counts[:, None] > 0,
                       sums / np.maximum(counts[:, None], 1.0), cents)
        shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        if shift < tol:
            break

    return cents, {"iters": len(inertia_log), "inertia": inertia_log,
                   "counts": counts.astype(np.int64)}


def kmeans_assign(ds, centroids: np.ndarray, *, id_col: str,
                  vec_col: str = "embedding", out: str = "cluster"):
    """Broadcast assignment pass: (id, cluster, dist) per row."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        x = _batch_matrix(t, vec_col)
        lab, d2 = _assign(x, c)
        return pa.table({id_col: t[id_col],
                         out: pa.array(lab.astype(np.int64)),
                         "dist": pa.array(np.sqrt(d2))})

    return ds.map_batches(assign, batch_format="pyarrow")
