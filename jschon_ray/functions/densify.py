"""Time-dimension densification (gap fill).

Windowed aggregates (`functions/windows.py`) emit only NON-EMPTY
buckets; ML feature pipelines and drift monitors usually need the dense
grid — every (key, time-bucket) cell between the corpus bounds, zeros
included — so downstream models see explicit absence instead of missing
rows.

Shape: ONE aggregate pass (per-block (key, bucket) partials, then a
groupby-sum over partial rows — the `tumbling_agg` shuffle shape); the
dense grid is then generated and left-joined DRIVER-side. Partitioning
assumption, stated per the custom-operator rule: the OUTPUT grid
(distinct keys x buckets in range) is aggregate-sized and must fit the
driver — the same static-domain assumption as `pivot_agg`'s category
set. The input is never re-read or re-shuffled to densify.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_FREQ = {"hour": "h", "day": "D", "minute": "min"}


def time_gapfill_counts(ds, *, key_col: str, ts_col: str,
                        value_col: str | None = None,
                        unit: str = "hour") -> pd.DataFrame:
    """count(*) (and optionally sum(value)) per (key, `unit` bucket),
    densified over [min bucket, max bucket] for every observed key.
    Rows with a null key or timestamp are dropped (SQL GROUP BY over
    non-null domains). Returns (key_col, window_start, n[, sum_value])."""
    freq = _FREQ[unit]
    cols = [key_col, ts_col] + ([value_col] if value_col else [])

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas().dropna(subset=[key_col, ts_col])
        df["window_start"] = df[ts_col].dt.floor(freq)
        spec = {"n": (ts_col, "size")}
        if value_col:
            spec["s"] = (value_col, "sum")
        agg = df.groupby([key_col, "window_start"], sort=False) \
            .agg(**spec).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    sums = ["n"] + (["s"] if value_col else [])
    merged = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([key_col, "window_start"]).sum(sums).to_pandas()
    merged = merged.rename(columns={f"sum({c})": c for c in sums})
    if not len(merged):
        out_cols = {key_col: [], "window_start": pd.Series(
            [], dtype="datetime64[us]"), "n": pd.Series([], dtype="int64")}
        if value_col:
            out_cols["sum_value"] = pd.Series([], dtype="float64")
        return pd.DataFrame(out_cols)

    keys = sorted(merged[key_col].unique())
    lo, hi = merged["window_start"].min(), merged["window_start"].max()
    grid = pd.MultiIndex.from_product(
        [keys, pd.date_range(lo, hi, freq=freq)],
        names=[key_col, "window_start"])
    dense = merged.set_index([key_col, "window_start"]) \
        .reindex(grid).reset_index()
    dense["n"] = dense["n"].fillna(0).astype(np.int64)
    if value_col:
        dense["sum_value"] = dense["s"].fillna(0.0)
        dense = dense.drop(columns=["s"])
    dense["window_start"] = dense["window_start"] \
        .astype("datetime64[us]")
    return dense
