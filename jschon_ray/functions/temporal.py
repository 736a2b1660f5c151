"""Temporal / ordered-join operators Ray Data lacks natively.

Three operators, each with the partitioning assumption it relies on stated
explicitly (the "custom operators" rule — document what the shuffle key
guarantees):

* ``asof_join`` — for every left row (by, ts) attach the nearest right row
  at-or-before (backward) / at-or-after (forward) its timestamp. Ray Data
  has no cogroup, so both sides are schema-aligned, tagged, unioned, and
  co-grouped with ONE ``groupby(by).map_groups`` shuffle; the per-group
  merge is a vectorized ``np.searchsorted`` — no Python row loop.
  Partitioning assumption: one `by` key's rows fit a single group task.
  For huge keys pass ``tolerance`` + ``time_bucket`` to sub-partition each
  key by coarse time bucket (right rows are replicated into the adjacent
  bucket, so every in-tolerance match stays co-located — exact, not
  approximate).

* ``range_join_broadcast`` — join a large Dataset against a SMALL
  driver-side interval table (value in [lo, hi)). The interval table is
  broadcast in the task closure (tiny by contract); the probe is one
  vectorized searchsorted per batch for non-overlapping intervals, a
  per-interval mask fan-out otherwise. No shuffle at all.

* ``top_k_per_group`` — SQL ``row_number() OVER (PARTITION BY g ORDER BY
  v) <= k``. Top-k per group is a mergeable combiner, so every block is
  pruned to ≤ k rows per group BEFORE the shuffle: the groupby moves at
  most k·groups rows per block, never the fact table.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa


def _ts_to_i8(values: pd.Series) -> np.ndarray:
    """int64 view of a timestamp/numeric Series (datetimes in us, matching
    Arrow `timestamp[us]`, so tolerances/buckets are microseconds)."""
    arr = values.to_numpy()
    if np.issubdtype(arr.dtype, np.datetime64):
        return arr.astype("datetime64[us]").astype(np.int64)
    return arr.astype(np.int64)


def _to_us(value) -> int:
    if isinstance(value, (int, np.integer)):
        return int(value)
    return int(pd.Timedelta(value).value // 1000)


def _nullable(col: pd.Series) -> pd.Series:
    """Lift to a null-capable dtype before masking (int stays int via
    pandas' nullable Int64 instead of decaying to float)."""
    if pd.api.types.is_integer_dtype(col.dtype):
        return col.astype("Int64")
    return col


def _arrow_ts_i8(col) -> np.ndarray:
    """int64 view of a timestamp/numeric Arrow column (datetimes in us).
    Nulls are filled with 0 — callers mask them out of the match set
    separately (a NaT->INT64_MIN conversion would both break searchsorted
    sortedness and spuriously match the earliest row in forward mode)."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us")).cast(pa.int64())
    elif col.type != pa.int64():
        col = col.cast(pa.int64())
    return pc.fill_null(col, 0).to_numpy(zero_copy_only=False) \
        .astype(np.int64)


def _merge_asof_group(t: pa.Table, *, on: str, left_cols, right_cols,
                      direction: str, tolerance_us, how: str,
                      right_tie) -> pa.Table:
    """Vectorized as-of merge of one co-grouped (left+right) Arrow table.

    `t` carries left columns, right columns (already under their output
    names, with the right timestamp in `right_cols[0]`), and `__side`
    (1=left, 0=right). All column plumbing stays Arrow: the sides are
    SPLIT before any pandas conversion, so the structural nulls in the
    other side's slots never widen int64 payloads to float64 (the
    2^53-precision hazard hash_join's docstring names), and the matched
    right values are emitted via Arrow take + if_else — int64 stays
    int64 with true nulls for unmatched rows."""
    import pyarrow.compute as pc

    right_on = right_cols[0]
    side = t["__side"]
    lt_t = t.filter(pc.equal(side, 1)).select(left_cols)
    rt_t = t.filter(pc.equal(side, 0)).select(right_cols)
    # a null right timestamp can never be the nearest match
    rt_t = rt_t.filter(pc.is_valid(rt_t[right_on]))

    # tie rule: among equal right timestamps pick the MAX right_tie. The
    # backward probe lands on the last row of an equal-ts run, the forward
    # probe on the first — so the run is ordered tie-ascending for
    # backward, tie-descending for forward.
    if rt_t.num_rows:
        rdf = rt_t.select([right_on] + ([right_tie] if right_tie else [])) \
            .to_pandas()
        sort_keys = [right_on] + ([right_tie] if right_tie else [])
        ascending = [True] + ([direction == "backward"] if right_tie
                              else [])
        ridx = rdf.sort_values(sort_keys, ascending=ascending,
                               kind="stable").index.to_numpy(np.int64)
        rt_t = rt_t.take(pa.array(ridx))

    n_left = lt_t.num_rows
    lts_ok = pc.is_valid(lt_t[on]).to_numpy(zero_copy_only=False) \
        if n_left else np.zeros(0, bool)
    lt = _arrow_ts_i8(lt_t[on]) if n_left else np.zeros(0, np.int64)
    order = np.argsort(lt, kind="stable")
    lt_sorted = lt[order]
    rt = _arrow_ts_i8(rt_t[right_on]) if rt_t.num_rows \
        else np.zeros(0, np.int64)

    if direction == "backward":
        idx = np.searchsorted(rt, lt_sorted, side="right") - 1
        valid = idx >= 0
        if tolerance_us is not None and len(rt):
            gap = lt_sorted - rt[np.clip(idx, 0, len(rt) - 1)]
            valid &= gap <= tolerance_us
    else:  # forward
        idx = np.searchsorted(rt, lt_sorted, side="left")
        valid = idx < len(rt)
        if tolerance_us is not None and len(rt):
            gap = rt[np.clip(idx, 0, len(rt) - 1)] - lt_sorted
            valid &= gap <= tolerance_us
    valid &= lts_ok[order]                # null left ts never matches

    left_ordered = lt_t.take(pa.array(order, pa.int64()))
    cols = {c: left_ordered[c] for c in left_cols}
    safe = np.clip(idx, 0, max(len(rt) - 1, 0))
    vmask = pa.array(valid)
    for c in right_cols:
        typ = rt_t.schema.field(c).type
        if rt_t.num_rows:
            taken = rt_t[c].take(pa.array(safe, pa.int64())) \
                .combine_chunks()
            cols[c] = pc.if_else(vmask, taken, pa.scalar(None, typ))
        else:
            cols[c] = pa.nulls(n_left, typ)
    res = pa.table(cols)
    if how == "inner":
        res = res.filter(vmask)
    return res


def asof_join(left, right, *, on: str, by: str, direction: str = "backward",
              tolerance=None, how: str = "left", suffix: str = "_r",
              right_tie: str | None = None, time_bucket=None):
    """As-of join two Datasets: for each left row, the nearest right row
    with the same `by` key at-or-before (`backward`) / at-or-after
    (`forward`) the left row's `on` timestamp. `how`: 'left' (unmatched
    rows keep null right columns) or 'inner'.

    `tolerance` / `time_bucket`: pandas-Timedelta-like or int (microseconds
    for timestamp columns, raw units for numeric). With `time_bucket` set
    (requires `tolerance <= time_bucket`) each key is additionally
    partitioned by coarse time bucket with right rows replicated into the
    adjacent bucket — exact results even when one hot key exceeds a
    single task's memory.

    Right-side timestamp ties break toward the max `right_tie` value
    (stable-sorted last), so the result is deterministic under any block
    order. Colliding right column names take `suffix`; `right_tie` names
    the OUTPUT (possibly suffixed) column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    tol_us = None if tolerance is None else _to_us(tolerance)
    bucket_us = None
    if time_bucket is not None:
        bucket_us = _to_us(time_bucket)
        if tol_us is None or tol_us > bucket_us:
            raise ValueError("time_bucket requires tolerance <= time_bucket")

    lsch, rsch = left.schema(), right.schema()
    left_cols = list(lsch.names)
    for col, sch, side in ((on, lsch, "left"), (by, lsch, "left"),
                           (on, rsch, "right"), (by, rsch, "right")):
        if col not in sch.names:
            raise ValueError(f"asof_join: column {col!r} missing from the "
                             f"{side} side (have {sch.names})")
    rename = {}                              # right source -> output name
    for name in rsch.names:
        if name == by:
            continue
        rename[name] = name if name not in left_cols else name + suffix
    right_on_out = rename[on] if on in rename else on
    # right timestamp first: _merge_asof_group reads right_cols[0] as ts
    right_cols = [right_on_out] + [v for k, v in rename.items()
                                   if v != right_on_out]
    ltype = dict(zip(lsch.names, lsch.types))
    rtype = dict(zip(rsch.names, rsch.types))
    union_fields = [(by, ltype[by])] + \
        [(c, ltype[c]) for c in left_cols if c != by] + \
        [(rename[k], rtype[k]) for k in rename]

    def tag(t: pa.Table, side: int) -> pa.Table:
        cols = {}
        for name, typ in union_fields:
            if side == 1:
                src = name if name in t.column_names else None
            else:
                inv = {v: k for k, v in rename.items()}
                src = by if name == by else inv.get(name)
            if src is not None and src in t.column_names:
                col = t[src]
                cols[name] = col.cast(typ) if col.type != typ else col
            else:
                cols[name] = pa.nulls(t.num_rows, typ)
        cols["__side"] = pa.array(np.full(t.num_rows, side, np.int8))
        out = pa.table(cols)
        if bucket_us is None:
            return out
        ts_col = out[on] if side == 1 else out[right_on_out]
        b = np.floor_divide(_ts_to_i8(ts_col.to_pandas()), bucket_us)
        out = out.append_column("__bucket", pa.array(b))
        if side == 1:
            return out
        # replicate right rows into the bucket their probes live in
        shift = 1 if direction == "backward" else -1
        rep = out.set_column(out.schema.get_field_index("__bucket"),
                             "__bucket", pa.array(b + shift))
        return pa.concat_tables([out, rep])

    unioned = left.map_batches(functools.partial(tag, side=1),
                               batch_format="pyarrow").union(
        right.map_batches(functools.partial(tag, side=0),
                          batch_format="pyarrow"))

    group_keys = [by] if bucket_us is None else [by, "__bucket"]
    merge = functools.partial(
        _merge_asof_group, on=on, left_cols=left_cols,
        right_cols=right_cols, direction=direction, tolerance_us=tol_us,
        how=how, right_tie=right_tie)

    def merge_group(t: pa.Table) -> pa.Table:
        if bucket_us is not None:
            t = t.drop_columns(["__bucket"])
        return merge(t)

    return unioned.groupby(group_keys).map_groups(merge_group,
                                                  batch_format="pyarrow")


def range_join_broadcast(ds, intervals, *, value_col: str,
                         lo_col: str = "lo", hi_col: str = "hi",
                         how: str = "inner"):
    """Join each row of `ds` to the interval(s) [lo, hi) containing
    `value_col`. `intervals` is a small driver-side table (pandas / arrow /
    iterable of dicts) broadcast in the task closure — NO shuffle.

    Non-overlapping intervals: one vectorized searchsorted per batch.
    Overlapping: per-interval mask fan-out (a row joins every interval
    containing it — SQL inner-join semantics). `how='left'` keeps
    unmatched rows with null interval columns (non-overlapping only).
    """
    if isinstance(intervals, pa.Table):
        idf = intervals.to_pandas()
    elif isinstance(intervals, pd.DataFrame):
        idf = intervals.copy()
    else:
        idf = pd.DataFrame(list(intervals))
    idf = idf.sort_values(lo_col, kind="stable").reset_index(drop=True)
    lo = idf[lo_col].to_numpy()
    hi = idf[hi_col].to_numpy()
    if np.any(hi < lo):
        raise ValueError("interval with hi < lo")
    overlapping = bool(np.any(hi[:-1] > lo[1:])) if len(idf) > 1 else False
    if overlapping and how == "left":
        raise ValueError("how='left' requires non-overlapping intervals")
    extra_cols = [c for c in idf.columns if c not in (lo_col, hi_col)]

    def probe(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False)
        notna = ~pd.isna(v)
        if len(idf) == 0:
            # empty interval table: zero matches (inner) / all-null
            # interval columns (left); hi[safe] below would IndexError
            cols = {c: t[c] for c in t.column_names}
            for c in (lo_col, hi_col, *extra_cols):
                cols[c] = pa.nulls(t.num_rows)
            out = pa.table(cols)
            return out if how == "left" else out.slice(0, 0)
        if not overlapping:
            idx = np.searchsorted(lo, v, side="right") - 1
            safe = np.clip(idx, 0, len(lo) - 1)
            ok = (idx >= 0) & notna
            ok &= np.where(ok, v < hi[safe], False)
            cols = {c: t[c] for c in t.column_names}
            for c in (lo_col, hi_col, *extra_cols):
                vals = pd.Series(idf[c].to_numpy()[safe])
                if how == "left":
                    vals = _nullable(vals).where(pd.Series(ok))
                cols[c] = pa.array(vals)
            out = pa.table(cols)
            return out if how == "left" else out.filter(pa.array(ok))
        parts = []
        for i in range(len(idf)):
            sub = t.filter(pa.array((v >= lo[i]) & (v < hi[i]) & notna))
            for c in (lo_col, hi_col, *extra_cols):
                sub = sub.append_column(
                    c, pa.array([idf[c].iloc[i]] * sub.num_rows))
            parts.append(sub)
        return pa.concat_tables(parts)

    return ds.map_batches(probe, batch_format="pyarrow")


def _block_topk(df: pd.DataFrame, *, group_cols, order_col, k,
                descending, tie_cols) -> pd.DataFrame:
    by = [order_col, *tie_cols]
    asc = [not descending] + [True] * len(tie_cols)
    df = df.sort_values(by, ascending=asc, kind="stable")
    return df.groupby(list(group_cols), sort=False, dropna=False).head(k)


def top_k_per_group(ds, *, group_cols, order_col: str, k: int,
                    descending: bool = True, tie_cols=()):
    """Top k rows per group by `order_col` — SQL `QUALIFY row_number()
    OVER (PARTITION BY group ORDER BY order) <= k`, ties broken by
    `tie_cols` ascending (deterministic under any partitioning).

    Scale shape: a per-block partial top-k (the combiner) prunes each
    block to ≤ k rows per group BEFORE the one groupby shuffle; the final
    map_groups re-ranks the ≤ k·blocks survivors per group. The fact
    table itself never shuffles.
    """
    fn = functools.partial(_block_topk, group_cols=tuple(group_cols),
                           order_col=order_col, k=k, descending=descending,
                           tie_cols=tuple(tie_cols))
    pruned = ds.map_batches(fn, batch_format="pandas")
    return pruned.groupby(list(group_cols)).map_groups(
        fn, batch_format="pandas")


def _arrow_types(ds, cols):
    """{col: pyarrow type} from a Dataset schema (arrow- or pandas-
    backed); object dtypes map to string."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    out = {}
    if isinstance(base, pa.Schema):
        for c in cols:
            out[c] = base.field(c).type
        return out
    for n, t in zip(sch.names, sch.types):
        if n in cols:
            if isinstance(t, pa.DataType):
                out[n] = t
            else:
                try:
                    out[n] = pa.from_numpy_dtype(t)
                except (pa.ArrowNotImplementedError, TypeError):
                    out[n] = pa.string()
    return out


def interval_join(left, right, *, by: str, lo_col: str = "lo",
                  hi_col: str = "hi", left_cols=None, right_cols=None,
                  tile_us: int = 3_600_000_000, suffix: str = "_r",
                  num_buckets: int = 64):
    """Large-LARGE interval overlap join (the big-side complement of
    `range_join_broadcast`): emit (l, r) pairs with equal `by` key whose
    half-open intervals overlap (l.lo < r.hi AND r.lo < l.hi). Interval
    bounds are int64 (microseconds or any consistent unit).

    Scale shape: each row replicates into every time TILE its interval
    spans (`tile_us` sets the granularity — pick >= the typical interval
    length so replication stays near 1x); both sides co-group via ONE
    hash-bucketed shuffle keyed on (by, tile); within a bucket a C-speed
    pandas merge on (by, tile) builds candidates and a vectorized filter
    keeps overlaps. A pair spanning several tiles is emitted ONLY in the
    tile containing max(l.lo, r.lo) — the ownership rule makes
    cross-tile duplicates impossible with no dedup pass. Documented
    assumption: per-(key, tile) row counts stay task-sized; shrink
    `tile_us` for dense keys (replication rises, group size falls).

    Returns (by, *left_cols, lo, hi, *right_cols+suffix, lo_r, hi_r,
    overlap) with exact-int overlap lengths.
    """
    import functools

    left_cols = list(left_cols or [])
    right_cols = list(right_cols or [])

    def tiled(side):
        def explode(t: pa.Table, keep) -> pa.Table:
            df = t.to_pandas().dropna(subset=[by, lo_col, hi_col])
            lo = df[lo_col].to_numpy(np.int64)
            hi = df[hi_col].to_numpy(np.int64)
            t0 = lo // tile_us
            t1 = np.maximum(hi - 1, lo) // tile_us
            reps = (t1 - t0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(df)), reps)
            # tile sequence per row: global offset trick
            starts = np.repeat(t0, reps)
            within = np.arange(reps.sum()) \
                - np.repeat(np.cumsum(reps) - reps, reps)
            out = df.iloc[idx][[by] + keep + [lo_col, hi_col]].copy()
            out["_tile"] = starts + within
            out["_side"] = side
            return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)

        return explode

    ltypes = _arrow_types(left, [by] + left_cols + [lo_col, hi_col])
    rtypes = _arrow_types(right, [by] + right_cols + [lo_col, hi_col])
    # the union schema: left payload under its own names, right payload
    # under suffixed names; each side fills the other side's slots with
    # typed nulls (values never read; output dtypes are repaired by the
    # final cast pass)
    union_fields = [(by, ltypes[by])] \
        + [(c, ltypes[c]) for c in left_cols] \
        + [(lo_col, pa.int64()), (hi_col, pa.int64())] \
        + [(c + suffix, rtypes[c]) for c in right_cols] \
        + [(lo_col + suffix, pa.int64()), (hi_col + suffix, pa.int64())]

    def align(t: pa.Table, side: int) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name, typ in union_fields:
            src = None
            if side == 1 and name in t.column_names:
                src = t[name]
            elif side == 0:
                plain = name[:-len(suffix)] if name.endswith(suffix) \
                    else name
                if name == by:
                    src = t[by]
                elif plain in t.column_names and name != plain:
                    src = t[plain]
            cols[name] = src.cast(typ) if src is not None \
                else pa.nulls(n, type=typ)
        cols["_tile"] = t["_tile"]
        cols["_side"] = t["_side"]
        return pa.table(cols)

    lt = left.select_columns([by] + left_cols + [lo_col, hi_col]) \
        .map_batches(functools.partial(tiled(1), keep=left_cols),
                     batch_format="pyarrow") \
        .map_batches(functools.partial(align, side=1),
                     batch_format="pyarrow")
    rt = right.select_columns([by] + right_cols + [lo_col, hi_col]) \
        .map_batches(functools.partial(tiled(0), keep=right_cols),
                     batch_format="pyarrow") \
        .map_batches(functools.partial(align, side=0),
                     batch_format="pyarrow")

    def bucketize(t: pa.Table) -> pa.Table:
        # shared pair-key mixer (graph.pair_bucket_of): keep every
        # pair-keyed operator on the one mixing convention instead of
        # per-row string concatenation
        from ..state.sketches import hash_array
        from .graph import pair_bucket_of

        kh = hash_array(t[by].to_pandas()).astype(np.uint64)
        tiles = t["_tile"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = pair_bucket_of(kh, tiles.view(np.uint64), num_buckets)
        return t.append_column("_bucket", pa.array(b))

    tagged = lt.union(rt).map_batches(bucketize, batch_format="pyarrow")

    lcols = [by, "_tile"] + left_cols + [lo_col, hi_col]
    rcols = [by, "_tile"] + [c + suffix for c in right_cols] \
        + [lo_col + suffix, hi_col + suffix]

    def join_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # split sides BEFORE pandas: each side's own columns carry no
        # structural nulls, so int64 payloads stay int64 (the unioned
        # frame's typed nulls would widen them to float64 and corrupt
        # values past 2^53)
        sidec = t["_side"]
        lg = t.filter(pc.equal(sidec, 1)).select(lcols).to_pandas()
        rg = t.filter(pc.equal(sidec, 0)).select(rcols).to_pandas()
        cand = lg.merge(rg, on=[by, "_tile"])
        if not len(cand):
            return cand.drop(columns=["_tile"]).assign(
                overlap=pd.Series([], dtype="int64"))
        llo = cand[lo_col].to_numpy(np.int64)
        lhi = cand[hi_col].to_numpy(np.int64)
        rlo = cand[lo_col + suffix].to_numpy(np.int64)
        rhi = cand[hi_col + suffix].to_numpy(np.int64)
        start = np.maximum(llo, rlo)
        keep = (llo < rhi) & (rlo < lhi) \
            & (start // tile_us == cand["_tile"].to_numpy(np.int64))
        out = cand[keep].drop(columns=["_tile"]).copy()
        out["overlap"] = (np.minimum(lhi, rhi) - start)[keep]
        return out

    joined = tagged.groupby("_bucket").map_groups(join_bucket,
                                                  batch_format="pyarrow")

    def repair(t: pa.Table) -> pa.Table:
        cols = {}
        for name, typ in union_fields:
            col = t[name]
            if pa.types.is_floating(col.type) \
                    and not pa.types.is_floating(typ):
                col = col.cast(typ)
            elif col.type != typ:
                col = col.cast(typ)
            cols[name] = col
        cols["overlap"] = t["overlap"].cast(pa.int64())
        return pa.table(cols)

    return joined.map_batches(repair, batch_format="pyarrow")
