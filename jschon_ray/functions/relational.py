"""Wide-table relational reshapes: pivot, exact grouped quantiles over
low-cardinality domains, ordered grouped string aggregation.

All three follow the partial-then-merge shape (SURVEY §4 "pre-aggregate
inside map_batches"): each block reduces to at most (groups × categories)
partial rows before anything shuffles, so the exchange volume is bounded
by the OUTPUT size, not the input size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pivot_agg(ds, *, row_key: str, col_codes_batch, categories: list,
              value_col: str | None = None, prefix: str = "c"):
    """Pivot to a wide table: one row per `row_key`, one count column
    (and, with `value_col`, one sum column) per category.

    `col_codes_batch(batch) -> np.ndarray[int]` maps each row to a
    category index in [0, len(categories)); -1 drops the row. The
    category set is STATIC (schema fixed before execution — the
    jschon-style compile-time column set, SURVEY §2.2
    additionalProperties note).

    Per-block partial: one np.bincount over (row_group × category) codes
    — a single fused histogram, no per-category pass; then one
    pre-aggregated groupby(row_key).sum over groups×categories partial
    rows. Output columns: `{prefix}{cat}_n` (+ `{prefix}{cat}_sum`).
    """
    ncat = len(categories)
    names = [f"{prefix}{c}_n" for c in categories]
    sum_names = [f"{prefix}{c}_sum" for c in categories] if value_col \
        else []

    def partial(t: pa.Table) -> pa.Table:
        codes = np.asarray(col_codes_batch(t))
        keys = t[row_key].to_pandas()
        kcodes, uniq = pd.factorize(keys, sort=False)
        keep = (codes >= 0) & (kcodes >= 0)
        flat = kcodes[keep] * ncat + codes[keep]
        counts = np.bincount(flat, minlength=len(uniq) * ncat) \
            .reshape(len(uniq), ncat)
        cols = {row_key: pa.array(uniq)}
        for j, n in enumerate(names):
            cols[n] = pa.array(counts[:, j].astype(np.int64))
        if value_col:
            vals = t[value_col].to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            sums = np.bincount(flat, weights=vals[keep],
                               minlength=len(uniq) * ncat) \
                .reshape(len(uniq), ncat)
            for j, n in enumerate(sum_names):
                cols[n] = pa.array(sums[:, j])
        return pa.table(cols)

    agg = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(row_key).sum(names + sum_names)
    renames = {f"sum({n})": n for n in names + sum_names}

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns([renames.get(c, c) for c in t.column_names])
        for n in names:
            i = t.schema.get_field_index(n)
            t = t.set_column(i, n, pc.round(t[n]).cast(pa.int64()))
        return t

    return agg.map_batches(finish, batch_format="pyarrow")


def grouped_median_lowcard(ds, *, key: str, value_col: str,
                           out: str = "median"):
    """EXACT per-group median when the value domain is low-cardinality
    (ints, codes, small discrete grids): shuffle (key, value) COUNT pairs
    — never rows — then a vectorized weighted-median finish per key.

    ANSI/DuckDB `median` semantics: for even group sizes, the mean of the
    two middle values (quantile_cont interpolation), so oracles
    hash-match. Complements the t-digest path in pipelines/stats.py
    (approximate, any domain) with an exact one where the domain allows.
    """
    counts = ds.select_columns([key, value_col]) \
        .map_batches(
            lambda t: t.group_by([key, value_col])
                       .aggregate([([], "count_all")]),
            batch_format="pyarrow") \
        .groupby([key, value_col]).sum("count_all")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value_col, kind="mergesort")
        w = g["sum(count_all)"].to_numpy(np.int64)
        v = g[value_col].to_numpy(np.float64)
        n = int(w.sum())
        cum = np.cumsum(w)
        if n % 2:
            med = v[np.searchsorted(cum, n // 2 + 1)]
        else:
            lo = v[np.searchsorted(cum, n // 2)]
            hi = v[np.searchsorted(cum, n // 2 + 1)]
            med = (lo + hi) / 2.0
        return pd.DataFrame({key: [g[key].iloc[0]], out: [float(med)]})

    return counts.groupby(key).map_groups(finish, batch_format="pandas")


def grouped_string_agg(ds, *, key: str, value_col: str, order_col: str,
                       sep: str = "|", out: str = "agg"):
    """Deterministic grouped concatenation: values joined by `sep` in
    `order_col` order within each key — SQL
    `string_agg(value, sep ORDER BY order_col)`.

    The full (key, value, order) projection shuffles; use on filtered /
    projected inputs (concatenation output is inherently
    group-row-sized). Ordering requires (order_col) unique per key for a
    deterministic result.
    """
    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col, kind="mergesort")
        return pd.DataFrame({
            key: [g[key].iloc[0]],
            out: [sep.join(str(v) for v in g[value_col])],
            "n_parts": [len(g)]})

    return ds.select_columns([key, value_col, order_col]) \
        .groupby(key).map_groups(finish, batch_format="pandas")
