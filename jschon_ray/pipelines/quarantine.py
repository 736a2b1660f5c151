"""Quarantine split: route a validated Dataset to clean / quarantine
sinks in one pass.

The write-path composition a delivery pipeline ends with: validate ->
clean rows (minus bookkeeping columns) stream to `out_dir/clean/`,
invalid rows KEEP their violation details and land in
`out_dir/quarantine/`, and only a summary dict reaches the driver. Both
sinks are partitioned parquet (one file per block — the resumable-output
contract: re-running a shard overwrites its own files, never a giant
single file).

The reference separates verdicts from error trees in one in-memory
result (`/root/reference/jschon/jsonschema.py:269-305` scope.valid +
collect errors); at dataset scale the separation is physical: two sinks,
so downstream consumers never re-filter the full corpus.
"""

from __future__ import annotations

import os

import pyarrow as pa

from .validate import validate_dataset


def quarantine_split(ds, spec, out_dir: str, *, keep_columns=None,
                     drop_payload_in_quarantine=True,
                     payload_cols=("bytes",), **validate_kwargs):
    """Validate `ds` against `spec` and write clean/quarantine sinks.

    Returns {'n': total, 'n_clean': ..., 'n_quarantined': ...,
    'clean_dir': ..., 'quarantine_dir': ...}. The summary comes from two
    streaming counts — no row set is ever collected on the driver.

    `drop_payload_in_quarantine`: violation rows are for humans and
    re-ingest tooling; payload blobs usually should not be duplicated
    into the quarantine sink (re-fetch by key instead).
    """
    checked = validate_dataset(ds, spec, keep_columns=keep_columns,
                               **validate_kwargs)
    clean_dir = os.path.join(out_dir, "clean")
    quar_dir = os.path.join(out_dir, "quarantine")

    def split(valid: bool):
        def fn(t: pa.Table) -> pa.Table:
            col = t["valid"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            import pyarrow.compute as pc

            mask = col if valid else pc.invert(col)
            part = t.filter(mask)
            if valid:
                return part.drop_columns(
                    [c for c in ("valid", "violations")
                     if c in part.column_names])
            drop = [c for c in payload_cols
                    if drop_payload_in_quarantine
                    and c in part.column_names]
            return part.drop_columns(drop) if drop else part
        return fn

    # checked is consumed twice (two sinks + counts); materialize the
    # validated narrow result once so the read+validate lineage doesn't
    # re-run per consumer. Blocks spill to the object store if large.
    checked = checked.materialize()
    clean = checked.map_batches(split(True), batch_format="pyarrow")
    quar = checked.map_batches(split(False), batch_format="pyarrow")
    clean.write_parquet(clean_dir)
    quar.write_parquet(quar_dir)
    n = checked.count()
    n_quar = quar.count()
    return {"n": n, "n_clean": n - n_quar, "n_quarantined": n_quar,
            "clean_dir": clean_dir, "quarantine_dir": quar_dir}
