"""Partitioned hash join for two large Datasets.

The portable bucketed pattern (ray_guide "Joins and lookups"): add
``bucket = hash(key) % B`` to both sides, tag the side, union, then
``groupby(bucket).map_groups`` joins each co-grouped bucket with a pandas
merge. Broadcast joins (pipelines/validate.referential_violations) stay the
right tool when one side is small; this is for fact×fact.

Skew note: a hot key lands in one bucket; cap with more buckets or by
salting the *probe* side and replicating the build side per salt — we keep
B configurable and document the assumption that a single bucket's rows fit
one worker's memory.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.sketches import hash_array


def _tag_batch(batch: pa.Table, key: str, side: int, num_buckets: int,
               all_cols: list) -> pa.Table:
    keys = batch[key]
    bucket = (hash_array(keys.to_pandas()) % num_buckets).astype(np.int64)
    cols = {"__bucket": pa.array(bucket),
            "__side": pa.array(np.full(batch.num_rows, side, np.int8))}
    for name, typ in all_cols:
        if name in batch.column_names:
            cols[name] = batch[name].cast(typ) \
                if batch.schema.field(name).type != typ else batch[name]
        else:
            cols[name] = pa.nulls(batch.num_rows, typ)
    return pa.table(cols)


def hash_join(left, right, *, on: str, how: str = "inner",
              num_buckets: int = 32, suffixes=("", "_r")):
    """Join two Datasets on one key column. Returns a lazy Dataset.

    how: 'inner' | 'left'. Column collisions get `suffixes` applied to the
    right side (the join key stays unsuffixed).
    """
    lsch = left.schema()
    rsch = right.schema()
    lcols = list(zip(lsch.names, lsch.types))
    rname_map = {}
    rcols = []
    for n, t in zip(rsch.names, rsch.types):
        if n == on:
            continue
        out = n if n not in lsch.names else n + suffixes[1]
        rname_map[n] = out
        rcols.append((out, t))
    all_cols = [(on, lsch.types[lsch.names.index(on)])] \
        + [(n, t) for n, t in lcols if n != on] + rcols

    def tag_right(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns(
            [rname_map.get(c, c) for c in batch.column_names])
        return _tag_batch(batch, on, 1, num_buckets, all_cols)

    tagged = left.map_batches(
        functools.partial(_tag_batch, key=on, side=0,
                          num_buckets=num_buckets, all_cols=all_cols),
        batch_format="pyarrow",
    ).union(right.map_batches(tag_right, batch_format="pyarrow"))

    lnames = [on] + [n for n, _ in lcols if n != on]
    rnames = [n for n, _ in rcols]
    join_type = {"inner": "inner", "left": "left outer"}[how]

    def join_bucket(g: pa.Table) -> pa.Table:
        # arrow-native per-bucket join: typed nulls never widen int64 ->
        # float64 the way a pandas merge would
        import pyarrow.compute as pc
        lmask = pc.equal(g["__side"], 0)
        l = g.filter(lmask).select(lnames)
        r = g.filter(pc.invert(lmask)).select([on] + rnames)
        return l.join(r, keys=on, join_type=join_type)

    return tagged.groupby("__bucket").map_groups(join_bucket,
                                                 batch_format="pyarrow")


class _BroadcastJoiner:
    """Per-batch C++ hash join against one object-store copy of the small
    side (materialized once per actor in __init__, never per batch)."""

    def __init__(self, small_ref, on, how):
        import ray

        self.small = ray.get(small_ref) \
            if isinstance(small_ref, ray.ObjectRef) else small_ref
        self.on = on
        self.how = "left outer" if how == "left" else "inner"

    def __call__(self, batch: pa.Table) -> pa.Table:
        return batch.join(self.small, keys=self.on, join_type=self.how)


def broadcast_join(ds, small, *, on: str, how: str = "inner",
                   concurrency=None):
    """Enrich a large Dataset with a SMALL dimension table — the
    no-shuffle fact×dim plan (ray_guide "Joins and lookups": broadcast the
    small side with ray.put once, probe per batch).

    `small`: pyarrow Table / pandas DataFrame (driver-side). Each batch
    runs one pyarrow C++ hash join against the broadcast table; the fact
    side never moves. `how`: 'inner' | 'left'. Rows of `small` must be
    unique on `on` (enforced) so the output row count is predictable.

    Complements `hash_join` (both sides large -> bucketed shuffle) and
    `referential_violations` (membership-only anti-join).
    """
    import ray

    if isinstance(small, pd.DataFrame):
        small = pa.Table.from_pandas(small, preserve_index=False)
    n_keys = len(small.column(on).unique())
    if n_keys != small.num_rows:
        raise ValueError(f"broadcast_join: small side not unique on {on!r}")
    small = small.combine_chunks()
    if small.nbytes <= 4 << 20:
        # tiny dim: closure-capture into STATELESS tasks — no actor-pool
        # spin-up (measured: the pool costs ~3s wall for a 5-row dim);
        # the task closure ships once per worker process, not per batch
        joiner = _BroadcastJoiner(small, on, how)
        return ds.map_batches(joiner.__call__, batch_format="pyarrow")
    small_ref = ray.put(small)
    from ..pipelines.validate import default_concurrency

    return ds.map_batches(
        _BroadcastJoiner,
        fn_constructor_kwargs=dict(small_ref=small_ref, on=on, how=how),
        batch_format="pyarrow",
        concurrency=concurrency or default_concurrency(),
    )
