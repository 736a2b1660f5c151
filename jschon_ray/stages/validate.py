"""Validation stage: a stateful map_batches callable holding a compiled plan.

Actor-pool pattern (ray_guide): the declarative spec dict (cheap to pickle)
ships to each actor; the actor compiles it ONCE against the first batch's
schema (`__init__`/first-call, not per batch) — the Ray analogue of the
reference compiling a JSONSchema once and evaluating many instances
(/root/reference/jschon/jsonschema.py:27-125 vs :191-220).

Use:
    ds.map_batches(SpecValidator, fn_constructor_kwargs=dict(spec=SPEC),
                   batch_format="pyarrow", batch_size=64_000,
                   concurrency=N, num_cpus=1)
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..state.allocator import tune_worker_allocator
from ..vspec.catalog import SpecCatalog
from ..vspec.evaluator import VIOLATIONS_TYPE, CompiledSpec, compile_spec


class SpecValidator:
    """Appends `valid:bool` + `violations:list<struct>` to each batch."""

    def __init__(self, spec, *, formats_factory=None, keep_columns=None,
                 extra_specs=None):
        tune_worker_allocator()  # actor-pool path: once per actor process
        self.spec = spec
        self.formats = formats_factory() if formats_factory else None
        self.keep_columns = keep_columns
        self._plan: CompiledSpec | None = None

    def _plan_for(self, schema: pa.Schema) -> CompiledSpec:
        if self._plan is None or not self._plan.table_schema.equals(schema):
            self._plan = compile_spec(self.spec, schema,
                                      catalog=SpecCatalog(),
                                      formats=self.formats)
        return self._plan

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._plan_for(batch.schema).check_batch(batch)
        if self.keep_columns is not None:
            out = out.select(list(self.keep_columns) + ["valid", "violations"])
        return out


# Per-worker-process compiled-plan cache for the STATELESS validator path.
# A plain function fuses with the parquet read into one task (no object-store
# hop for heavy payload columns between read and validate); the cache gives
# the same compile-once-per-worker behaviour as the actor pool.
_PLAN_CACHE: dict = {}


def validate_batch_fn(batch: pa.Table, *, spec, keep_columns=None) -> pa.Table:
    import json

    key = (json.dumps(spec, sort_keys=True, default=str)[:512],
           tuple(batch.schema.names),
           tuple(str(f.type) for f in batch.schema))
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        tune_worker_allocator()  # once per worker, before heavy batches
        plan = _PLAN_CACHE[key] = compile_spec(spec, batch.schema,
                                               catalog=SpecCatalog())
    out = plan.check_batch(batch)
    if keep_columns is not None:
        out = out.select(list(keep_columns) + ["valid", "violations"])
    return out


class ViolationExploder:
    """Flatten per-row violation lists into one row per violation.

    Vectorized: list_flatten + list_parent_indices; key columns are gathered
    by take(). Output schema: key_cols + instanceLocation / keywordLocation /
    absoluteKeywordLocation / error (the reference's `basic` error unit,
    /root/reference/jschon/output.py:46-70).
    """

    def __init__(self, key_cols=("clip_id",)):
        self.key_cols = list(key_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["violations"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)
        par = pc.list_parent_indices(col)
        cols = {k: pc.take(batch[k], par) for k in self.key_cols}
        for f in ("instanceLocation", "keywordLocation",
                  "absoluteKeywordLocation", "error"):
            cols[f] = pc.struct_field(flat, f)
        return pa.table(cols)


def empty_violations_table(key_cols=("clip_id",),
                           key_types=(pa.string(),)) -> pa.Table:
    fields = [(k, t) for k, t in zip(key_cols, key_types)]
    fields += [("instanceLocation", pa.string()),
               ("keywordLocation", pa.string()),
               ("absoluteKeywordLocation", pa.string()),
               ("error", pa.string())]
    return pa.table({n: pa.array([], t) for n, t in fields})
