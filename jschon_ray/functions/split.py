"""Deterministic dataset splitting + sampling for training pipelines.

Both operators are pure per-batch kernels — NO shuffle, no driver state,
reproducible under any partitioning — because assignment depends only on a
row's id hash, never on position or block order:

* ``assign_split`` — train/valid/test (any fractions) by hashed id.
* ``stratified_sample`` — per-group rate-controlled sample by hashed id,
  so re-runs (and retried tasks) pick the SAME rows.

Hash = md5 of the id string (first 8 hex digits → [0, 1) bucket), so any
external system — including the DuckDB oracles — can reproduce the
assignment exactly; this costs a per-row digest and is the documented
price of cross-system determinism (engine-internal keys use the
vectorized state.sketches.hash_array instead).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _unit_hash(ids) -> np.ndarray:
    """md5(id) -> float in [0, 1): first 32 bits / 2^32."""
    out = np.empty(len(ids), np.float64)
    for i, v in enumerate(ids):
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        out[i] = h / 4294967296.0
    return out


def assign_split(batch: pa.Table, *, id_col: str, fracs: dict,
                 out: str = "split") -> pa.Table:
    """Append a split-label column: {'train': .8, 'valid': .1, 'test': .1}.

    Labels partition [0,1) in dict insertion order; fractions must sum to
    1 (±1e-9). A row's label is a pure function of its id.
    """
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    ids = batch[id_col].to_pylist()
    u = _unit_hash(ids)
    labels = list(fracs)
    edges = np.cumsum([fracs[k] for k in labels])
    idx = np.searchsorted(edges, u, side="right")
    idx = np.minimum(idx, len(labels) - 1)
    lab = np.array(labels, dtype=object)[idx]
    return batch.append_column(out, pa.array(lab.tolist(), pa.string()))


def stratified_sample(batch: pa.Table, *, id_col: str, group_col: str,
                      rates: dict, default_rate: float = 0.0) -> pa.Table:
    """Keep each row with its group's rate, deterministically by id hash.

    `rates`: {group_value: keep_fraction}; groups not listed use
    `default_rate`. Filtering happens inside the batch — upstream blocks
    stream through untouched, so this composes with any pipeline position.
    """
    u = _unit_hash(batch[id_col].to_pylist())
    groups = batch[group_col].to_pylist()
    thresh = np.array([rates.get(g, default_rate) for g in groups])
    return batch.filter(pa.array(u < thresh))


def mixture_resample(ds, *, id_col: str, group_col: str,
                     target: dict | None = None):
    """Domain-mixture rebalancing (the data-mixing step): per-group keep
    rates derived from the OBSERVED group counts so the kept sample hits
    the target mixture, applied as a deterministic md5 threshold —
    rerun-stable, partition-invariant, idempotent under retry (the
    split/stratified-sample convention).

    target=None (uniform): rate_g = min_count / count_g — every group
    contributes ~min_count rows. With a dict {group: weight}, rates are
    scaled so the heaviest-constrained group keeps 100%. Two phases: one
    key-sized count aggregate, then a broadcast stateless filter; rows
    with an unknown/null group are dropped. Emits (id_col, group_col).
    """
    counts_df = ds.groupby(group_col).count().to_pandas()
    counts_df = counts_df.dropna(subset=[group_col])
    counts = dict(zip(counts_df[group_col],
                      counts_df["count()"].astype(int)))
    if target is None:
        mn = min(counts.values())
        rates = {g: mn / c for g, c in counts.items()}
    else:
        # scale so max_g (target_g * total / count_g) == 1
        scale = max(t / counts[g] for g, t in target.items()
                    if g in counts)
        rates = {g: min((target.get(g, 0.0) / counts[g]) / scale, 1.0)
                 for g in counts}

    def keep(t: pa.Table) -> pa.Table:
        df = t.select([id_col, group_col]).to_pandas() \
            .dropna(subset=[group_col])
        u = _unit_hash(df[id_col])
        r = df[group_col].map(rates).fillna(0.0).to_numpy(np.float64)
        out = df.loc[u < r]
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

    return ds.map_batches(keep, batch_format="pyarrow")


def weighted_sample(batch: pa.Table, *, id_col: str, weight_col: str,
                    factor: float) -> pa.Table:
    """Weight-proportional deterministic Bernoulli sample: keep a row iff
    ``u(id) * factor < weight`` — i.e. with probability min(1, w/factor),
    reproducibly by id hash (same md5 unit-interval recipe as
    `assign_split`, so oracles and retried tasks pick the SAME rows).

    Pure per-batch kernel: no shuffle, no global pass; heavier documents
    are kept proportionally more often, the standard weighted-importance
    downsample for mixing pretraining corpora.
    """
    ids = batch[id_col].to_pylist()
    u = _unit_hash(ids)
    w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
    keep = (u * factor) < w
    return batch.filter(pa.array(keep))
