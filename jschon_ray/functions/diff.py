"""Snapshot diff — added / removed / changed rows between table versions.

The data-versioning primitive a validation pipeline needs around every
delivery: "what changed since the last accepted snapshot?". The reference
re-validates whole documents per run (jschon is stateless per evaluate,
/root/reference/jschon/jsonschema.py:269-305); at dataset scale the
interesting contract is the DELTA — rows that appeared, disappeared, or
changed under a key.

Scale shape: each side is tagged and projected to (key, compared columns)
ONLY — payloads and untracked columns never enter the exchange (hash wide
payloads into one column first if needed). Rows route to
`hash(key) % n_buckets` coarse buckets, so the single shuffle carries the
narrow projection once and the per-group Python overhead is O(n_buckets)
(the ngram_jaccard / fingerprint bucket pattern); inside a bucket one
vectorized pandas outer merge classifies every key.

Requires keys unique per side (enforced — duplicate keys in a bucket
raise, the snapshot analogue of uniqueItems).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.sketches import hash_array


def snapshot_diff(ds_old, ds_new, *, key_col: str, compare_cols,
                  n_buckets: int = 64):
    """Diff two Datasets by key: one output row per key whose presence or
    compared values differ — status in {'added', 'removed', 'changed'},
    with old/new values of each compared column (None on the absent
    side). Unchanged keys emit nothing, so the output is delta-sized.
    NULL vs NULL compares equal; NULL vs value is a change (SQL
    IS DISTINCT FROM semantics, so the DuckDB oracle matches exactly).
    """
    compare_cols = list(compare_cols)
    cols = [key_col] + compare_cols

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            b = (hash_array(t[key_col].to_pandas())
                 % np.uint64(n_buckets)).view(np.int64)
            t = t.append_column("_bucket", pa.array(b))
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, side, np.int8)))
        return fn

    tagged = ds_old.map_batches(tag(0), batch_format="pyarrow") \
        .union(ds_new.map_batches(tag(1), batch_format="pyarrow"))

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["_side"] == 0][cols]
        new = g[g["_side"] == 1][cols]
        for side_name, side in (("old", old), ("new", new)):
            if side[key_col].duplicated().any():
                dup = side[key_col][side[key_col].duplicated()].iloc[0]
                raise ValueError(
                    f"snapshot_diff: duplicate key {dup!r} in {side_name} "
                    f"snapshot — keys must be unique per side")
        m = old.merge(new, on=key_col, how="outer",
                      suffixes=("_old", "_new"), indicator=True)
        status = np.where(m["_merge"] == "right_only", "added",
                          np.where(m["_merge"] == "left_only", "removed",
                                   "changed"))
        if len(m):
            both = (m["_merge"] == "both").to_numpy()
            same = both.copy()
            for c in compare_cols:
                a, b = m[f"{c}_old"], m[f"{c}_new"]
                eq = (a == b) | (a.isna() & b.isna())
                same &= eq.to_numpy()
            keep = ~same
        else:
            keep = np.zeros(0, bool)
        out = m[keep].copy()
        out["status"] = status[keep]
        return out[[key_col, "status"]
                   + [f"{c}_{s}" for c in compare_cols
                      for s in ("old", "new")]]

    return tagged.groupby("_bucket").map_groups(
        diff_bucket, batch_format="pandas")


def scd2_history(ds_old, ds_new, *, key_col: str, compare_cols,
                 v_old: int = 1, v_new: int = 2, n_buckets: int = 64,
                 open_sentinel: int = -1):
    """Build a slowly-changing-dimension type-2 history from two
    snapshot versions: one row per (key, effective interval) with
    `valid_from` / `valid_to` version stamps (`valid_to ==
    open_sentinel` marks the currently-open row).

      unchanged key -> (values, v_old, open)
      changed   key -> (old values, v_old, v_new) + (new values, v_new, open)
      removed   key -> (old values, v_old, v_new)
      added     key -> (new values, v_new, open)

    Same scale shape as `snapshot_diff` (one coarse-bucket keyed outer
    merge of the narrow projections), but output is history-sized
    (>= max(|old|, |new|) rows) — the point of SCD2 — so callers write
    it to a sink rather than the driver.
    """
    compare_cols = list(compare_cols)
    cols = [key_col] + compare_cols

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            b = (hash_array(t[key_col].to_pandas())
                 % np.uint64(n_buckets)).view(np.int64)
            t = t.append_column("_bucket", pa.array(b))
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, side, np.int8)))
        return fn

    tagged = ds_old.map_batches(tag(0), batch_format="pyarrow") \
        .union(ds_new.map_batches(tag(1), batch_format="pyarrow"))

    def hist_bucket(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["_side"] == 0][cols]
        new = g[g["_side"] == 1][cols]
        m = old.merge(new, on=key_col, how="outer",
                      suffixes=("_old", "_new"), indicator=True)
        n = len(m)
        if not n:
            return pd.DataFrame(
                {key_col: [], **{c: [] for c in compare_cols},
                 "valid_from": [], "valid_to": []})
        both = (m["_merge"] == "both").to_numpy()
        added = (m["_merge"] == "right_only").to_numpy()
        removed = (m["_merge"] == "left_only").to_numpy()
        same = both.copy()
        for c in compare_cols:
            a, b = m[f"{c}_old"], m[f"{c}_new"]
            eq = (a == b) | (a.isna() & b.isna())
            same &= eq.to_numpy()
        changed = both & ~same

        frames = []
        # old-valued rows: unchanged (open) / changed+removed (closed)
        for mask, vfrom, vto, side in (
                (same, v_old, open_sentinel, "_old"),
                (changed, v_old, v_new, "_old"),
                (removed, v_old, v_new, "_old"),
                (changed, v_new, open_sentinel, "_new"),
                (added, v_new, open_sentinel, "_new")):
            sub = m[mask]
            if not len(sub):
                continue
            frames.append(pd.DataFrame({
                key_col: sub[key_col].to_numpy(),
                **{c: sub[f"{c}{side}"].to_numpy()
                   for c in compare_cols},
                "valid_from": np.full(len(sub), vfrom, np.int64),
                "valid_to": np.full(len(sub), vto, np.int64)}))
        return pd.concat(frames, ignore_index=True)

    return tagged.groupby("_bucket").map_groups(
        hist_bucket, batch_format="pandas")
