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
