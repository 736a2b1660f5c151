"""Z-order (Morton) clustered layout + min-max-stats pruned scans.

Data-layout optimization for multi-column selective reads at scale: the
reference engine has no storage layer at all (it validates one in-memory
document, /root/reference/jschon/json.py:34), but a 100 TB validation
corpus lives in files, and "read only the rows a box predicate touches"
is a LAYOUT property, not a query property. Clustering rows by the
interleaved bits of several key columns (Morton / Z-order, the standard
technique in analytic table formats) makes file- and row-group-level
min/max statistics selective on EVERY clustered column at once, so a
pruned scan can skip most of the corpus without an index.

Design (all stages stream; driver state is O(files + quantile edges)):

1. one sampling pass -> per-column equi-depth edges (skew-robust rank
   space, bounded per-block sample);
2. ``map_batches``: rank-normalize each cluster column via searchsorted,
   bit-interleave to a uint64 z-value;
3. range-partition by sampled z-quantiles -> ``groupby(file bucket)
   .map_groups`` writes one z-sorted parquet file per bucket (file names
   are deterministic per bucket, so task retries overwrite idempotently
   — the resumable-output posture of jobs/validate_job.py);
4. ``pruned_scan`` reads ONLY the files whose parquet footer min/max
   stats intersect the box predicate, then applies the exact residual
   filter inside the read.

The sort is per-bucket (inside one map_groups group), never a global
``ds.sort`` — the only all-to-all exchange is the single bucket shuffle.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.io import read_parquet_clean


def _atomic_write_table(table: pa.Table, path: str, **kw) -> None:
    """Crash-safe parquet write: data lands under ``<path>.inprogress``
    and becomes visible only via an atomic rename. A task killed
    mid-write leaves an ``.inprogress`` orphan that every scan ignores;
    a retried task overwrites both names idempotently (deterministic
    per-bucket file names — same posture as jobs/validate_job.py)."""
    tmp = path + ".inprogress"
    pq.write_table(table, tmp, **kw)
    os.replace(tmp, path)


def _atomic_write_json(obj, path: str) -> None:
    tmp = path + ".inprogress"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _manifest_files(out_dir: str) -> list[str] | None:
    """File list from the layout's ``_manifest.json``, or None when the
    layout predates the manifest (fall back to glob). Scans prefer the
    manifest so stale part files from an older, larger layout in the
    same directory are never read — and a manifest entry whose file is
    MISSING raises (interrupted overwrite: rebuild the layout)."""
    mpath = os.path.join(out_dir, "_manifest.json")
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        rows = json.load(f)
    files = sorted(r["file"] for r in rows)
    missing = [f for f in files if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"layout manifest at {mpath} lists missing files "
            f"{missing[:3]} — the layout was interrupted mid-overwrite; "
            "rewrite it")
    return files


# --------------------------------------------------------------------------
# z-value computation
# --------------------------------------------------------------------------

def interleave_bits(cols: list[np.ndarray], bits: int = 16) -> np.ndarray:
    """Interleave the low ``bits`` of 2..4 equal-length uint arrays into
    one uint64 Morton code (column j supplies bit position b*d + j).
    Vectorized across rows: bits*d shift-or passes over full arrays."""
    d = len(cols)
    if not 2 <= d <= 4:
        raise ValueError(f"interleave_bits supports 2-4 columns, got {d}")
    if bits * d > 64:
        raise ValueError(f"{bits} bits x {d} cols exceeds uint64")
    z = np.zeros(len(cols[0]), np.uint64)
    for j, c in enumerate(cols):
        c = c.astype(np.uint64)
        for b in range(bits):
            z |= ((c >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * d + j)
    return z


def _rank_normalize(values: np.ndarray, edges: np.ndarray,
                    bits: int) -> np.ndarray:
    """Map values into [0, 2^bits) rank space via equi-depth edges
    (len(edges) == 2^bits - 1). Nulls must be pre-masked; NaN sorts
    high under searchsorted, which is fine for clustering."""
    r = np.searchsorted(edges, values, side="right")
    return np.minimum(r, (1 << bits) - 1).astype(np.uint64)


def _sample_pass(ds, cols: list[str], per_block: int = 1024):
    """One streaming pass -> a bounded per-block sample of the cluster
    columns (driver holds O(blocks * per_block * d) scalars; at 4096
    blocks x 1k rows that is a few MB — the same bounded-sample posture
    as shuffle_rank's range partitioner)."""
    def partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.select(cols)
        if n <= per_block:
            return t.select(cols)
        # deterministic stride sample (no RNG in workers: block layout
        # invariance keeps retries idempotent)
        idx = np.linspace(0, n - 1, per_block).astype(np.int64)
        return t.select(cols).take(pa.array(idx))

    out = ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs()
    import ray
    tables = [t for t in ray.get(out) if t.num_rows]
    return pa.concat_tables(tables)


def zorder_write(ds, cols: list[str], out_dir: str, *,
                 num_files: int = 64, bits: int = 16,
                 sample_per_block: int = 1024) -> dict:
    """Cluster ``ds`` by the z-order of ``cols`` into ``num_files``
    z-sorted parquet files under ``out_dir``. Returns
    {"files": n, "rows": n, "manifest": path}.

    Null cluster keys rank as 0 (lowest z region) — they cluster
    together and stats-prune like any other value.
    """
    os.makedirs(out_dir, exist_ok=True)
    sample = _sample_pass(ds, cols, per_block=sample_per_block)
    if sample.num_rows == 0:
        raise ValueError("zorder_write: empty input dataset")

    qs = np.linspace(0, 1, (1 << bits) + 1)[1:-1]
    edges = {}
    s_arrays = {}
    for c in cols:
        v = sample[c].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        edges[c] = np.quantile(v, qs) if len(v) else np.zeros(len(qs))
        s_arrays[c] = v

    def z_of(table_cols: dict[str, np.ndarray]) -> np.ndarray:
        parts = []
        for c in cols:
            v = table_cols[c]
            nulls = np.isnan(v)
            r = _rank_normalize(v, edges[c], bits)
            r[nulls] = 0
            parts.append(r)
        return interleave_bits(parts, bits=bits)

    # file-bucket boundaries from the sample's own z-values
    zs = z_of({c: sample[c].to_numpy(zero_copy_only=False)
               .astype(np.float64) for c in cols})
    z_edges = np.quantile(zs, np.linspace(0, 1, num_files + 1)[1:-1]) \
        .astype(np.uint64)

    def tag(t: pa.Table) -> pa.Table:
        z = z_of({c: t[c].to_numpy(zero_copy_only=False)
                  .astype(np.float64) for c in cols})
        bucket = np.searchsorted(z_edges, z, side="right").astype(np.int64)
        return t.append_column("__z", pa.array(z)) \
                .append_column("__bucket", pa.array(bucket))

    def write_bucket(g: pa.Table) -> pa.Table:
        b = int(g["__bucket"][0].as_py())
        g = g.sort_by("__z").drop_columns(["__z", "__bucket"])
        path = os.path.join(out_dir, f"part-{b:05d}.parquet")
        # small row groups -> finer-grained footer stats for the scan
        _atomic_write_table(g, path,
                            row_group_size=max(8192, g.num_rows // 8))
        stats = {"file": [path], "rows": [g.num_rows]}
        for c in cols:
            col = g[c]
            stats[f"{c}_min"] = [pc.min(col).as_py()]
            stats[f"{c}_max"] = [pc.max(col).as_py()]
        return pa.table(stats)

    manifest = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__bucket") \
        .map_groups(write_bucket, batch_format="pyarrow") \
        .to_pandas()
    mpath = os.path.join(out_dir, "_manifest.json")
    # manifest last + atomic: its presence certifies a COMPLETE layout
    # (a killed run leaves parts but no manifest -> caller rewrites)
    _atomic_write_json(manifest.to_dict(orient="records"), mpath)
    return {"files": len(manifest), "rows": int(manifest["rows"].sum()),
            "manifest": mpath}


# --------------------------------------------------------------------------
# stats-pruned scan
# --------------------------------------------------------------------------

def pruned_scan(out_dir: str, predicates: dict[str, tuple], **read_kwargs):
    """Read only the files whose parquet footer min/max stats intersect
    the box ``predicates`` ({col: (lo_inclusive, hi_inclusive)}), with
    the exact residual filter applied inside the read.

    Returns (dataset, {"files_total": n, "files_read": n}). File pruning
    uses each file's FOOTER (O(files) metadata reads on the driver, no
    data pages touched); row-group-level pruning inside surviving files
    is delegated to the parquet reader via the same filter expression.
    """
    import glob

    import ray.data
    from pyarrow import dataset as pads

    files = _manifest_files(out_dir)
    if files is None:
        files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    if not files:
        raise ValueError(
            f"pruned_scan: layout at {out_dir} is empty (no files in the "
            "manifest) — rewrite it with zorder_write first")
    keep = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        hit = True
        for ci in range(md.num_columns):
            name = md.row_group(0).column(ci).path_in_schema
            if name not in predicates:
                continue
            lo, hi = predicates[name]
            fmin = min(md.row_group(g).column(ci).statistics.min
                       for g in range(md.num_row_groups))
            fmax = max(md.row_group(g).column(ci).statistics.max
                       for g in range(md.num_row_groups))
            if fmax < lo or fmin > hi:
                hit = False
                break
        if hit:
            keep.append(f)

    expr = None
    for c, (lo, hi) in predicates.items():
        e = (pads.field(c) >= lo) & (pads.field(c) <= hi)
        expr = e if expr is None else expr & e
    if not keep:
        # empty selection: the residual filter over any pruned file
        # yields zero rows (its footer already proved no overlap), so one
        # file read preserves the schema at no row cost
        ds = read_parquet_clean(files[:1], filter=expr, **read_kwargs)
        return ds, {"files_total": len(files), "files_read": 0}
    ds = read_parquet_clean(keep, filter=expr, **read_kwargs)
    return ds, {"files_total": len(files), "files_read": len(keep)}


# --------------------------------------------------------------------------
# hash-partitioned layout + per-file Bloom sidecars (point-lookup pruning)
# --------------------------------------------------------------------------

def hash_partition_write(ds, key_col: str, out_dir: str, *,
                         num_files: int = 32) -> dict:
    """Write ``ds`` hash-partitioned by ``key_col`` into ``num_files``
    parquet files (every key's rows land in exactly ONE file — the
    layout point lookups want, where z-order wants box scans).
    Deterministic file names per bucket make task retries idempotent.
    Returns {"files": n, "rows": n}.
    """
    from ..state.sketches import hash_array

    os.makedirs(out_dir, exist_ok=True)

    def tag(t: pa.Table) -> pa.Table:
        import pandas as pd
        k = pd.Series(t[key_col].to_numpy(zero_copy_only=False))
        b = (hash_array(k) % np.uint64(num_files)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def write_bucket(g: pa.Table) -> pa.Table:
        b = int(g["__bucket"][0].as_py())
        g = g.drop_columns(["__bucket"])
        path = os.path.join(out_dir, f"part-{b:05d}.parquet")
        _atomic_write_table(g, path)
        return pa.table({"file": [path], "rows": [g.num_rows]})

    manifest = ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("__bucket") \
        .map_groups(write_bucket, batch_format="pyarrow").to_pandas()
    if len(manifest) == 0:     # empty input: zero groups, column-less frame
        # an EMPTY manifest must still land: a previous layout's
        # manifest (and parts) in the same dir would otherwise survive
        # and manifest-driven scans would silently serve the old rows
        # for a layout the caller was just told is empty
        _atomic_write_json([], os.path.join(out_dir, "_manifest.json"))
        return {"files": 0, "rows": 0}
    _atomic_write_json(manifest.to_dict(orient="records"),
                       os.path.join(out_dir, "_manifest.json"))
    return {"files": len(manifest), "rows": int(manifest["rows"].sum())}


def bloom_index_write(out_dir: str, col: str, *, num_bits: int = 1 << 20,
                      num_hashes: int = 4) -> dict:
    """Build one Bloom-filter sidecar per ``part-*.parquet`` file in
    ``out_dir`` over ``col`` (written as ``<file>.bloom``). Min/max
    footer stats prune RANGE predicates; point lookups over a
    hash-partitioned or unclustered layout need per-file MEMBERSHIP —
    this is the classic file-skipping bloom index of analytic table
    formats. One Ray task per file reads ONLY the key column; the
    driver never sees row data. Returns {"files": n}.
    """
    import glob

    import ray

    from ..state.sketches import BloomFilter, hash_array

    files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))

    @ray.remote(num_cpus=1)
    def build_one(path: str) -> str:
        import pandas as pd
        t = pq.read_table(path, columns=[col])
        bf = BloomFilter(num_bits=num_bits, num_hashes=num_hashes)
        vals = t[col].drop_null()
        if len(vals):
            bf.add_hashes(hash_array(
                pd.Series(vals.to_numpy(zero_copy_only=False))))
        side = path + ".bloom"
        tmp = side + ".inprogress"
        with open(tmp, "wb") as f:
            f.write(bf.to_bytes())
        os.replace(tmp, side)   # crash-safe: scans never see a torn blob
        return side

    ray.get([build_one.remote(f) for f in files])
    return {"files": len(files)}


def bloom_point_scan(out_dir: str, col: str, keys, **read_kwargs):
    """Read only the files whose Bloom sidecar MAY contain any of
    ``keys`` (no false negatives: a file skipped by its bloom provably
    holds none of the keys), with the exact ``IN`` residual filter
    applied inside the read. Sidecars are O(KB) driver metadata reads —
    no data pages are touched for skipped files.

    Returns (dataset, {"files_total": n, "files_read": n}).
    """
    import glob

    import pandas as pd
    import ray.data
    from pyarrow import dataset as pads

    from ..state.sketches import BloomFilter, hash_array

    files = _manifest_files(out_dir)
    if files is None:
        files = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    if not files:
        raise ValueError(
            f"bloom_point_scan: no part-*.parquet files under {out_dir} "
            "(empty layout — write it with hash_partition_write first)")
    key_hashes = hash_array(pd.Series(list(keys)))
    keep = []
    for f in files:
        with open(f + ".bloom", "rb") as fh:
            bf = BloomFilter.from_bytes(fh.read())
        if bool(bf.contains_hashes(key_hashes).any()):
            keep.append(f)

    expr = pads.field(col).isin(list(keys))
    if not keep:
        ds = read_parquet_clean(files[:1], filter=expr, **read_kwargs)
        return ds, {"files_total": len(files), "files_read": 0}
    ds = read_parquet_clean(keep, filter=expr, **read_kwargs)
    return ds, {"files_total": len(files), "files_read": len(keep)}
