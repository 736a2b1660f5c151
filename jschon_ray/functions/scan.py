"""Distributed prefix-scan operators: sequence packing and global rank.

Order-dependent operators (cumulative sums, row numbering) don't fit a
single embarrassingly-parallel pass, but they do NOT need a driver-side
loop either. Both operators here use the classic two-phase scan:

  1. bucket every row by a balanced, order-preserving key range (so
     bucket 0 < bucket 1 < ... in the target order);
  2. one tiny aggregate — per-bucket totals (counts or token sums) —
     flows to the driver (K values, K ~ 64-4096, independent of row
     count), which computes the exclusive cumsum = each bucket's offset;
  3. a `groupby(bucket).map_groups` pass sorts each bucket locally and
     adds its offset.

At 10^12 rows only phase 3 touches the data again, and it is fully
partition-parallel; the driver handles K integers. The shuffle moves only
the scan's input columns (id + token count), never payloads.

The reference has no analogue (jschon is per-document); these serve the
training-data side of the engine: `pack_sequences` is the standard
fixed-token-budget packing used to build training batches, and
`global_rank` gives a deterministic, seeded global shuffle order
(rank = row_number over md5(id || ':' || seed) — reproducible by any
external system, including the DuckDB oracles).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket_offsets(ds, bucket_col: str, weight_col: str | None):
    """Tiny aggregate: per-bucket totals -> exclusive-cumsum offsets.

    Returns {bucket_id: offset}. The groupby result is K rows — safe to
    take_all at any data scale.
    """
    import ray.data  # noqa: F401

    if weight_col is None:
        agg = ds.groupby(bucket_col).count()
        key = "count()"
    else:
        agg = ds.groupby(bucket_col).sum(weight_col)
        key = f"sum({weight_col})"
    rows = agg.take_all()
    rows.sort(key=lambda r: r[bucket_col])
    offsets, acc = {}, 0
    for r in rows:
        offsets[r[bucket_col]] = acc
        acc += int(r[key])
    return offsets, acc


def _hash_bucket_batch(batch: pa.Table, *, id_col: str, seed: int,
                       num_buckets: int) -> pa.Table:
    """Append the seeded shuffle key (md5 hex of 'id:seed') and its
    order-preserving bucket (the key's leading 24 bits scaled to
    num_buckets — md5 output is uniform, so buckets are balanced for any
    id distribution with no sampling pass)."""
    ids = batch[id_col].to_pylist()
    keys = [hashlib.md5(f"{v}:{seed}".encode()).hexdigest() for v in ids]
    buckets = [int(k[:6], 16) * num_buckets >> 24 for k in keys]
    out = batch.append_column("_key", pa.array(keys, pa.string()))
    return out.append_column("_bucket", pa.array(buckets, pa.int32()))


def global_rank(ds, *, id_col: str, seed: int = 42,
                num_buckets: int = 64, out: str = "shuffle_rank"):
    """Deterministic seeded global shuffle order: rank i means this row is
    the i-th row (0-based) when sorted by md5(f"{id}:{seed}").

    Two-phase scan (see module docstring); emits (id_col, out). Ranks are
    globally contiguous 0..n-1 regardless of partitioning.
    """
    keyed = ds.select_columns([id_col]).map_batches(
        _hash_bucket_batch, batch_format="pyarrow",
        fn_kwargs=dict(id_col=id_col, seed=seed, num_buckets=num_buckets))
    # consumed twice (bucket totals, then the rank pass) — materialize the
    # narrow (id, key, bucket) projection once instead of re-running the
    # read + hash lineage; the object store spills if it outgrows memory
    keyed = keyed.materialize()
    offsets, _total = _bucket_offsets(keyed.select_columns(["_bucket"]),
                                      "_bucket", None)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_key", kind="mergesort")
        base = offsets[int(g["_bucket"].iloc[0])]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            out: base + np.arange(len(g), dtype=np.int64)})

    return keyed.groupby("_bucket").map_groups(rank_group)


def _ntile_of_rank(rank: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) over 0-based global ranks: the first n%k tiles get
    ceil(n/k) rows, the rest floor(n/k) — 1-based tile ids (exactly
    DuckDB/ANSI semantics, so oracles hash-match)."""
    q, r = divmod(n, k)
    cut = r * (q + 1)
    big = rank // (q + 1) if q + 1 else np.zeros_like(rank)
    small = r + (rank - cut) // q if q else np.zeros_like(rank)
    return np.where(rank < cut, big, small).astype(np.int64) + 1


def global_ntile(ds, *, id_col: str, k: int, seed: int = 42,
                 num_buckets: int = 64, out: str = "tile"):
    """Deterministic seeded NTILE(k): tile i of the global order sorted
    by md5(f"{id}:{seed}") — equal-size quantile buckets for sharded
    training splits / balanced exports.

    Same two-phase scan as `global_rank` (the driver sees K integers,
    never the data); the tile is a pure function of (rank, total, k), so
    the second pass stays embarrassingly parallel.
    """
    keyed = ds.select_columns([id_col]).map_batches(
        _hash_bucket_batch, batch_format="pyarrow",
        fn_kwargs=dict(id_col=id_col, seed=seed, num_buckets=num_buckets))
    keyed = keyed.materialize()
    offsets, total = _bucket_offsets(keyed.select_columns(["_bucket"]),
                                     "_bucket", None)

    def tile_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("_key", kind="mergesort")
        base = offsets[int(g["_bucket"].iloc[0])]
        ranks = base + np.arange(len(g), dtype=np.int64)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            out: _ntile_of_rank(ranks, total, k)})

    return keyed.groupby("_bucket").map_groups(tile_group)


def _range_bucket_batch(batch: pa.Table, *, id_col: str,
                        edges: np.ndarray) -> pa.Table:
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    b = np.searchsorted(edges, ids, side="right").astype(np.int32)
    return batch.append_column("_bucket", pa.array(b))


def pack_sequences(ds, *, id_col: str, tokens_col: str, budget: int,
                   num_buckets: int = 64, out: str = "pack_id"):
    """Fixed-token-budget sequence packing: documents are laid out in
    id order and cut into packs of `budget` tokens; a document's pack is
    exclusive_prefix_sum(tokens) // budget (documents may straddle a
    boundary — the standard concat-then-chunk layout used for LM
    training batches).

    Requires a numeric, unique `id_col` (the deterministic global order).
    Bucket edges are uniform over [min,max] — for skewed id spaces pass
    more buckets; totals per bucket still flow exactly through the
    offsets, only balance degrades. Emits (id_col, tokens_col, pack_id,
    pack_pos) where pack_pos is the token offset inside the pack.
    """
    narrow = ds.select_columns([id_col, tokens_col])
    stats = narrow.aggregate(*_min_max(id_col))
    lo, hi = stats[f"min({id_col})"], stats[f"max({id_col})"]
    if lo is None:               # empty input: no packs
        import ray.data

        return ray.data.from_items([])
    edges = np.linspace(lo, hi, num_buckets + 1)[1:-1]
    keyed = narrow.map_batches(
        _range_bucket_batch, batch_format="pyarrow",
        fn_kwargs=dict(id_col=id_col, edges=edges))
    keyed = keyed.materialize()  # consumed twice; narrow columns only
    offsets, _total = _bucket_offsets(
        keyed.select_columns(["_bucket", tokens_col]), "_bucket", tokens_col)

    def pack_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        toks = g[tokens_col].to_numpy().astype(np.int64)
        base = offsets[int(g["_bucket"].iloc[0])]
        excl = base + np.cumsum(toks) - toks
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            tokens_col: toks,
            out: excl // budget,
            "pack_pos": excl % budget})

    return keyed.groupby("_bucket").map_groups(pack_group)


def _min_max(col: str):
    from ray.data.aggregate import Max, Min
    return Min(col), Max(col)


def global_value_rank(ds, *, value_col: str, tie_cols=(),
                      num_buckets: int = 256, out: str = "rank"):
    """Exact global row number by (value, ties...) ascending — per-row
    order statistics (percent_rank / empirical CDF) via RANGE
    partitioning, the third partitioning strategy next to the hash
    (`global_rank`) and id-range (`pack_sequences`) scans.

    Same two-phase scan: uniform value-range bucket edges from one
    min/max aggregate (skewed distributions: raise `num_buckets` —
    totals stay exact, only balance degrades), per-bucket counts ->
    driver exclusive cumsum, then one per-bucket sort+offset pass.
    Rows with a null value are dropped. Emits the input's tie columns +
    (value_col, rank, pct) with 1-based rank and
    pct = (rank-1)/(n-1) (SQL percent_rank under a tie-broken total
    order).
    """
    cols = [value_col] + list(tie_cols)
    narrow = ds.select_columns(cols)

    def drop_null(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t[value_col]))

    narrow = narrow.map_batches(drop_null, batch_format="pyarrow")
    stats = narrow.aggregate(*_min_max(value_col))
    lo, hi = stats[f"min({value_col})"], stats[f"max({value_col})"]
    if lo is None:
        import ray.data

        return ray.data.from_items([])
    edges = np.linspace(lo, hi, num_buckets + 1)[1:-1]
    keyed = narrow.map_batches(
        _range_bucket_batch, batch_format="pyarrow",
        fn_kwargs=dict(id_col=value_col, edges=edges)).materialize()
    offsets, total = _bucket_offsets(
        keyed.select_columns(["_bucket"]), "_bucket", None)
    denom = max(total - 1, 1)

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value_col] + list(tie_cols), kind="mergesort")
        base = offsets[int(g["_bucket"].iloc[0])]
        rank = base + np.arange(1, len(g) + 1, dtype=np.int64)
        res = {c: g[c].to_numpy() for c in list(tie_cols) + [value_col]}
        res[out] = rank
        res["pct"] = (rank - 1) / denom
        return pd.DataFrame(res)

    return keyed.groupby("_bucket").map_groups(rank_group,
                                               batch_format="pandas")


def weighted_sample_topk(ds, *, id_col: str, weight_col: str, k: int,
                    seed: int = 42):
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES):
    each row draws key = ln(u)/w with u a seeded md5-derived uniform in
    (0,1]; the k LARGEST keys are the sample. Inclusion probability is
    proportional to weight, exactly as if drawing k times without
    replacement — the data-mixing primitive (sample k docs with
    source/length weights) at any scale.

    Scale shape: per-block partial top-k (combiner) means only k
    candidates per block ever leave a task; the final merge sees
    k x num_blocks rows (bounded, tiny) — no shuffle of non-candidates.
    Deterministic for any partitioning: u depends only on (id, seed), so
    the same rows win on 1 core or 1000 nodes, and any SQL engine can
    reproduce the draw from the same md5 expression. Rows with
    non-positive or null weight are excluded (they'd never be drawn).

    Emits (id_col, weight_col) for the k sampled rows.
    """
    _SCALE = float(16 ** 15)  # 15 hex chars fit a double exactly

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        u = np.array(
            [int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)
             for v in ids], dtype=np.float64) / _SCALE
        ok = np.isfinite(w) & (w > 0) & (u > 0)
        key = np.full(len(w), -np.inf)
        key[ok] = np.log(u[ok]) / w[ok]
        order = np.argsort(-key, kind="stable")[:k]
        order = order[np.isfinite(key[order])]
        idx = pa.array(order, pa.int64())
        return pa.table({
            id_col: t[id_col].take(idx),      # typed even when empty
            weight_col: t[weight_col].take(idx),
            "_key": pa.array(key[order], pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # k per block -> the candidate set is tiny; one driver-side merge
    tables = list(parts.iter_batches(batch_format="pyarrow"))
    if not tables:
        # empty input or no row with a valid positive weight
        sch = ds.schema()
        id_type = dict(zip(sch.names, sch.types))[id_col]
        w_type = dict(zip(sch.names, sch.types))[weight_col]
        return pa.schema([(id_col, id_type),
                          (weight_col, w_type)]).empty_table()
    cand = pa.concat_tables(tables)
    key = cand["_key"].to_numpy(zero_copy_only=False)
    ids = cand[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -key))[:k]
    out = cand.take(pa.array(np.sort(order), pa.int64()))
    return out.drop_columns(["_key"])


def key_gaps(ds, *, key_col: str):
    """Missing ranges (gaps) in a sparse integer key space — the
    islands-and-gaps audit (`lead(key) - key > 1` over the distinct
    sorted keys): one row per gap with (gap_lo, gap_hi, gap_len).

    Scale shape: a range shuffle (ds.sort) orders the distinct-key
    blocks; INTERNAL gaps come from one vectorized diff per block and
    stay distributed, while each block also emits its (min, max)
    summary — the driver stitches only the O(num_blocks) BOUNDARY
    candidates, never touching rows. Duplicate keys collapse in-block
    (np.unique) and across blocks via the boundary diff (gap <= 0 is
    dropped). Null keys are dropped before the int64 cast (they carry
    no gap information and would otherwise cast to garbage).
    """
    import ray

    # two consumers (internal gaps + block spans): materialize the
    # keys-only sorted projection (8 bytes/row) so the range shuffle
    # runs once, not twice
    narrow = ds.select_columns([key_col]).sort(key_col).materialize()

    def block_gaps(t: pa.Table) -> pa.Table:
        col = t[key_col].combine_chunks().drop_null()
        k = np.unique(col.to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        if len(k) == 0:
            return pa.table({"gap_lo": pa.array([], pa.int64()),
                             "gap_hi": pa.array([], pa.int64()),
                             "gap_len": pa.array([], pa.int64())})
        d = np.diff(k)
        idx = np.flatnonzero(d > 1)
        return pa.table({"gap_lo": pa.array(k[idx] + 1),
                         "gap_hi": pa.array(k[idx + 1] - 1),
                         "gap_len": pa.array(d[idx] - 1)})

    internal = narrow.map_batches(block_gaps, batch_format="pyarrow")

    # block (min, max) summaries -> boundary gaps on the driver
    def block_span(t: pa.Table):
        k = t[key_col].combine_chunks().drop_null() \
            .to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        return pa.table({"lo": pa.array([int(k.min())]),
                         "hi": pa.array([int(k.max())])})

    spans = narrow.map_batches(block_span,
                               batch_format="pyarrow").to_pandas()
    if spans.empty:    # empty input loses its schema through pandas
        spans = pd.DataFrame({"lo": pd.Series([], dtype="int64"),
                              "hi": pd.Series([], dtype="int64")})
    spans = spans.sort_values("lo").reset_index(drop=True)
    blo, bhi = [], []
    run_hi = None
    for lo, hi in zip(spans["lo"], spans["hi"]):
        if run_hi is not None and lo - run_hi > 1:
            blo.append(run_hi + 1)
            bhi.append(lo - 1)
        run_hi = hi if run_hi is None else max(run_hi, hi)
    boundary = pa.table({
        "gap_lo": pa.array(blo, pa.int64()),
        "gap_hi": pa.array(bhi, pa.int64()),
        "gap_len": pa.array([h - l + 1 for l, h in zip(blo, bhi)],
                            pa.int64())})
    return internal.union(ray.data.from_arrow(boundary))
