"""Exact distributed quantiles by iterative histogram refinement.

The sketch profile (state/sketches.py t-digest) gives APPROXIMATE
quantiles in one pass. This operator gives EXACT order statistics
(SQL ``quantile_disc`` / ``percentile_disc``: the element at 1-based rank
``max(1, ceil(q*n))``) over data far too large to sort globally:

  pass 0   per-block (count, min, max) partials -> driver combine
  iterate  one map_batches per round: each block histograms the target
           column into `bins` equal-width bins per still-active quantile
           interval; partial counts are two-level reduced (per-partition
           sum, then driver sum of <= reduce_parallelism rows) so the
           driver never sees O(num_blocks) data
  finish   when a quantile's candidate bin holds <= gather_limit values,
           one final filtered gather sorts just those values and picks
           the exact rank

Each round shrinks a quantile's candidate interval by ~`bins`x, so 3-4
rounds isolate a rank out of 10^12 float64 rows; the full column is
scanned per round but NEVER shuffled and never leaves the workers — only
fixed-size count vectors move. Duplicate-heavy columns converge when the
interval collapses to a single float (lo == hi).

The narrow column projection is materialized once so refinement rounds
re-read object-store blocks instead of re-running the upstream pipeline
(at 10^12 rows the single-column blocks stream/spill; trade off by
passing an un-materialized dataset with `materialize=False`).

No jschon analogue (the reference has no aggregates — SURVEY §2.9).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _disc_rank(q: float, n: int) -> int:
    return max(1, math.ceil(q * n))


def exact_quantiles(ds, col: str, qs, *, bins: int = 4096,
                    gather_limit: int = 65536,
                    reduce_parallelism: int = 16,
                    max_iters: int = 12,
                    materialize: bool = True) -> pd.DataFrame:
    """Exact ``quantile_disc`` values for each q in `qs` over ds[col]
    (nulls ignored). Returns a DataFrame (q, value) in input q order."""
    qs = list(qs)
    narrow = ds.select_columns([col])
    if materialize:
        narrow = narrow.materialize()

    def base_partial(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return pa.table({"n": pa.array([0], pa.int64()),
                             "lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf])})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    base = narrow.map_batches(base_partial, batch_format="pyarrow") \
        .to_pandas()
    n = int(base["n"].sum())
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype="float64"),
                             "value": pd.Series([None] * len(qs),
                                                dtype="float64")})
    gmin, gmax = float(base["lo"].min()), float(base["hi"].max())

    # per-quantile refinement state
    state = [{"q": q, "rank": _disc_rank(q, n), "lo": gmin, "hi": gmax,
              "below": 0, "value": None} for q in qs]
    if gmin == gmax:
        for s in state:
            s["value"] = gmin

    for _it in range(max_iters):
        active = [s for s in state if s["value"] is None
                  and s["hi"] > s["lo"]
                  and s["rank"] - s["below"] > 0]
        # collapsed intervals resolve immediately
        for s in state:
            if s["value"] is None and s["hi"] <= s["lo"]:
                s["value"] = s["lo"]
        if not active:
            break
        intervals = [(s["lo"], s["hi"]) for s in active]
        edge_sets = [np.linspace(lo, hi, bins + 1) for lo, hi in intervals]

        def hist_partial(t: pa.Table, edge_sets=edge_sets) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            rows = {"iid": pa.array(range(len(edge_sets)), pa.int64())}
            mats = []
            for edges in edge_sets:
                idx = np.searchsorted(edges, v, side="right") - 1
                inside = (v >= edges[0]) & (v <= edges[-1])
                idx = np.clip(idx, 0, len(edges) - 2)
                mats.append(np.bincount(idx[inside],
                                        minlength=len(edges) - 1)
                            .astype(np.int64))
            rows["counts"] = pa.array([m.tolist() for m in mats],
                                      pa.list_(pa.int64()))
            return pa.table(rows)

        def combine(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            agg = df.groupby("iid", sort=True)["counts"] \
                .apply(lambda ls: np.sum(np.vstack(list(ls)), axis=0)
                       .tolist()).reset_index()
            return pa.table({"iid": pa.array(agg["iid"], pa.int64()),
                             "counts": pa.array(agg["counts"],
                                                pa.list_(pa.int64()))})

        parts = narrow.map_batches(hist_partial, batch_format="pyarrow") \
            .repartition(reduce_parallelism) \
            .map_batches(combine, batch_format="pyarrow") \
            .to_pandas()
        totals = {iid: np.zeros(bins, np.int64) for iid in
                  range(len(active))}
        for _, row in parts.iterrows():
            totals[row["iid"]] += np.asarray(row["counts"], np.int64)

        for iid, s in enumerate(active):
            counts = totals[iid]
            edges = edge_sets[iid]
            cum = np.cumsum(counts)
            local = s["rank"] - s["below"]
            b = int(np.searchsorted(cum, local, side="left"))
            s["below"] += int(cum[b - 1]) if b > 0 else 0
            s["lo"] = float(edges[b])
            s["hi"] = float(edges[b + 1])
            in_bin = int(counts[b])
            if in_bin <= gather_limit or s["lo"] >= s["hi"]:
                s["value"] = "GATHER" if s["lo"] < s["hi"] else s["lo"]

    # final gather for quantiles whose candidate bin is small enough
    gather = [s for s in state if s["value"] == "GATHER"
              or s["value"] is None]
    if gather:
        bounds = [(s["lo"], s["hi"]) for s in gather]

        def gather_partial(t: pa.Table, bounds=bounds) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            iids, vals = [], []
            for i, (lo, hi) in enumerate(bounds):
                got = v[(v >= lo) & (v <= hi)]
                iids.append(np.full(len(got), i, np.int64))
                vals.append(got)
            return pa.table({"iid": pa.array(np.concatenate(iids)),
                             "val": pa.array(np.concatenate(vals))})

        got = narrow.map_batches(gather_partial,
                                 batch_format="pyarrow").to_pandas()
        for i, s in enumerate(gather):
            vals = np.sort(got.loc[got["iid"] == i, "val"].to_numpy())
            local = s["rank"] - s["below"]
            s["value"] = float(vals[local - 1])

    return pd.DataFrame({"q": pd.Series([s["q"] for s in state],
                                        dtype="float64"),
                         "value": pd.Series([s["value"] for s in state],
                                            dtype="float64")})


def grouped_quantile_disc(ds, key: str, col: str, q: float, *,
                          bins: int = 2048, gather_limit: int = 65536,
                          reduce_parallelism: int = 16,
                          max_iters: int = 12,
                          materialize: bool = True,
                          out: str = "value") -> pd.DataFrame:
    """EXACT per-group ``quantile_disc`` over ANY value domain — the
    general-domain complement of `relational.grouped_median_lowcard`
    (which needs a small discrete domain). Same iterative histogram
    refinement as `exact_quantiles`, with ONE fused (group x bin)
    bincount per block per round (the pivot_agg trick), so adding groups
    costs a wider count vector, not extra passes.

    Groups must be a bounded domain (driver holds one interval + one
    count vector per group — the pivot/static-category assumption).
    Returns a DataFrame (key, value) with the exact element at rank
    max(1, ceil(q*n_group)) per group; all-null groups get NaN.
    """
    narrow = ds.select_columns([key, col])
    if materialize:
        narrow = narrow.materialize()

    def base_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().dropna(subset=[key, col])
        v = df[col].to_numpy(np.float64)
        df = df.loc[~np.isnan(v)]
        v = v[~np.isnan(v)]
        g = df.groupby(key, sort=False)
        agg = g.agg(n=(col, "size"), lo=(col, "min"),
                    hi=(col, "max")).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    base = narrow.map_batches(base_partial, batch_format="pyarrow") \
        .to_pandas()
    if not len(base):
        return pd.DataFrame({key: [], out: pd.Series([], dtype="float64")})
    gb = base.groupby(key)
    groups = sorted(gb.groups)
    state = {}
    for k in groups:
        sub = gb.get_group(k)
        n = int(sub["n"].sum())
        state[k] = {"rank": _disc_rank(q, n), "lo": float(sub["lo"].min()),
                    "hi": float(sub["hi"].max()), "below": 0,
                    "value": None}
        if state[k]["lo"] == state[k]["hi"]:
            state[k]["value"] = state[k]["lo"]

    kidx = {k: i for i, k in enumerate(groups)}

    for _it in range(max_iters):
        active = [k for k in groups if state[k]["value"] is None]
        if not active:
            break
        aidx = {k: i for i, k in enumerate(active)}
        edge_sets = np.stack([np.linspace(state[k]["lo"], state[k]["hi"],
                                          bins + 1) for k in active])

        def hist_partial(t: pa.Table, edge_sets=edge_sets,
                         aidx=aidx) -> pa.Table:
            df = t.to_pandas().dropna(subset=[key, col])
            v = df[col].to_numpy(np.float64)
            ok = ~np.isnan(v)
            df, v = df.loc[ok], v[ok]
            gcodes = df[key].map(aidx)
            keep = gcodes.notna()
            v = v[keep.to_numpy()]
            gc = gcodes[keep].to_numpy(np.int64)
            na = len(aidx)
            b = np.empty(len(v), np.int64)
            for i in range(na):  # bounded: one searchsorted per group
                m = gc == i
                if m.any():
                    e = edge_sets[i]
                    bi = np.searchsorted(e, v[m], side="right") - 1
                    inside = (v[m] >= e[0]) & (v[m] <= e[-1])
                    bi = np.where(inside, np.clip(bi, 0, bins - 1), -1)
                    b[m] = bi
            keep2 = b >= 0
            fused = gc[keep2] * bins + b[keep2]
            counts = np.bincount(fused, minlength=na * bins) \
                .astype(np.int64)
            return pa.table({"counts": pa.array([counts.tolist()],
                                                pa.list_(pa.int64()))})

        def combine(t: pa.Table) -> pa.Table:
            m = np.vstack([np.asarray(r) for r in
                           t["counts"].to_pylist()]).sum(axis=0)
            return pa.table({"counts": pa.array([m.tolist()],
                                                pa.list_(pa.int64()))})

        parts = narrow.map_batches(hist_partial, batch_format="pyarrow") \
            .repartition(reduce_parallelism) \
            .map_batches(combine, batch_format="pyarrow").to_pandas()
        total = np.vstack([np.asarray(r) for r in parts["counts"]]) \
            .sum(axis=0).reshape(len(active), bins)

        for k in active:
            s = state[k]
            counts = total[aidx[k]]
            edges = edge_sets[aidx[k]]
            cum = np.cumsum(counts)
            local = s["rank"] - s["below"]
            b = int(np.searchsorted(cum, local, side="left"))
            s["below"] += int(cum[b - 1]) if b > 0 else 0
            s["lo"] = float(edges[b])
            s["hi"] = float(edges[b + 1])
            if int(counts[b]) <= gather_limit or s["lo"] >= s["hi"]:
                s["value"] = "GATHER" if s["lo"] < s["hi"] else s["lo"]

    gather = [k for k in groups
              if state[k]["value"] == "GATHER"
              or state[k]["value"] is None]
    if gather:
        gidx = {k: i for i, k in enumerate(gather)}
        bounds = [(state[k]["lo"], state[k]["hi"]) for k in gather]

        def gather_partial(t: pa.Table, gidx=gidx,
                           bounds=bounds) -> pa.Table:
            df = t.to_pandas().dropna(subset=[key, col])
            v = df[col].to_numpy(np.float64)
            ok = ~np.isnan(v)
            df, v = df.loc[ok], v[ok]
            gcodes = df[key].map(gidx)
            keep = gcodes.notna().to_numpy()
            v, gc = v[keep], gcodes[keep].to_numpy(np.int64)
            los = np.asarray([b[0] for b in bounds])[gc]
            his = np.asarray([b[1] for b in bounds])[gc]
            m = (v >= los) & (v <= his)
            return pa.table({"iid": pa.array(gc[m]),
                             "val": pa.array(v[m])})

        got = narrow.map_batches(gather_partial,
                                 batch_format="pyarrow").to_pandas()
        for k in gather:
            s = state[k]
            vals = np.sort(got.loc[got["iid"] == gidx[k], "val"]
                           .to_numpy())
            s["value"] = float(vals[s["rank"] - s["below"] - 1])

    return pd.DataFrame({key: groups,
                         out: [state[k]["value"] for k in groups]})


def grouped_tdigest_quantiles(ds, *, key: str, value_col: str, qs,
                              delta: int = 200):
    """Approximate per-key quantiles via mergeable t-digests — the
    100 TB path when values-per-key are too large for the exact
    (key, value)-count shuffle of ``grouped_quantile_disc``.

    Scale shape: each block builds ONE t-digest per key it contains
    (vectorized ``add_batch`` per key-run after a block-local sort) and
    ships only the serialized digests — O(keys x delta) bytes per block
    regardless of row count. A single small groupby merges per-key
    digests and extracts the quantiles. Exactness: rank error is
    bounded by the digest's compression (tests pin <=1% on skewed
    data); use grouped_quantile_disc when bit-exactness vs SQL matters.

    Returns one row per key with a ``p{q*100:g}`` column per q.
    """
    import pandas as pd
    import pyarrow as pa

    from ..state.sketches import TDigest

    qs = list(qs)

    def partial(t: pa.Table) -> pa.Table:
        import numpy as np

        keys = t[key].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ok = ~np.isnan(vals)
        keys, vals = keys[ok], vals[ok]
        order = np.argsort(keys, kind="mergesort")
        keys, vals = keys[order], vals[order]
        out_k, out_b = [], []
        if len(keys):
            bounds = np.flatnonzero(
                np.r_[True, keys[1:] != keys[:-1], True])
            for a, b in zip(bounds[:-1], bounds[1:]):
                d = TDigest(delta)
                d.add_batch(vals[a:b])
                out_k.append(keys[a])
                out_b.append(d.to_bytes())
        return pa.table({key: pa.array(out_k),
                         "blob": pa.array(out_b, pa.binary())})

    parts = ds.select_columns([key, value_col]).map_batches(
        partial, batch_format="pyarrow")

    names = [f"p{q * 100:g}" for q in qs]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for blob in g["blob"]:
            d = TDigest.from_bytes(blob)
            acc = d if acc is None else acc.merge(d)
        row = {key: [g[key].iloc[0]]}
        for q, name in zip(qs, names):
            row[name] = [acc.quantile(q)]
        return pd.DataFrame(row)

    return parts.groupby(key).map_groups(merge, batch_format="pandas")
