"""Spec-driven repair: turn a validation contract into a fixing stage.

The reference treats `default` as a pure annotation (collected, never
applied — /root/reference/jschon/vocabulary/annotation.py); at dataset
scale the natural extension is to APPLY the contract: fill nulls with the
spec's `default`, clamp numerics into inclusive bounds, reset
out-of-enum values to the default, truncate over-long strings. Rows the
spec cannot fix (e.g. enum violation with no default) are left for the
validator/quarantine path.

`compile_repair(spec)` builds one vectorized pyarrow.compute kernel
chain per column at compile time (the evaluator's compile-once pattern,
vspec/evaluator.py); the returned callable is a pure map_batches fn —
stateless, partition-invariant, SQL-mirrorable (COALESCE / CASE /
least / greatest / substr), so DuckDB oracles can hash-verify repairs.

Repair rules per property (applied in this order, each only when the
relevant keyword is present):
  1. null + `default`            -> default
  2. `enum` + not-in + `default` -> default
  3. `minimum`/`maximum`         -> clamp (inclusive bounds only;
     exclusive bounds have no nearest member to clamp to)
  4. `maxLength`                 -> truncate to maxLength code units
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def compile_repair(spec: dict):
    """Returns (fn, touched_cols): fn is a map_batches-ready callable
    appending a `repaired` bool column (true where any rule changed the
    row)."""
    props = spec.get("properties", {})
    rules = []          # (col, [step fns])
    for col, sub in props.items():
        steps = []
        default = sub.get("default")
        if default is not None:
            steps.append(("fill_null", default))
        if "enum" in sub and default is not None:
            steps.append(("enum", (list(sub["enum"]), default)))
        if "minimum" in sub:
            steps.append(("min", sub["minimum"]))
        if "maximum" in sub:
            steps.append(("max", sub["maximum"]))
        if "maxLength" in sub:
            steps.append(("maxlen", int(sub["maxLength"])))
        if steps:
            rules.append((col, steps))

    def apply(batch: pa.Table) -> pa.Table:
        changed = pa.array([False] * batch.num_rows, pa.bool_())
        for col, steps in rules:
            if col not in batch.column_names:
                continue
            arr = batch[col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            orig = arr
            for kind, arg in steps:
                if kind == "fill_null":
                    arr = pc.fill_null(arr, pa.scalar(arg, arr.type))
                elif kind == "enum":
                    allowed, default = arg
                    ok = pc.is_in(arr, value_set=pa.array(allowed,
                                                          arr.type))
                    # nulls were handled by fill_null; keep them as-is
                    ok = pc.fill_null(ok, True)
                    arr = pc.if_else(ok, arr, pa.scalar(default, arr.type))
                elif kind == "min":
                    # skip_nulls=False: a null without a default must
                    # STAY null (validator/quarantine territory), not be
                    # silently replaced by the bound
                    arr = pc.max_element_wise(
                        arr, pa.scalar(arg, arr.type), skip_nulls=False)
                elif kind == "max":
                    arr = pc.min_element_wise(
                        arr, pa.scalar(arg, arr.type), skip_nulls=False)
                elif kind == "maxlen":
                    over = pc.greater(pc.utf8_length(arr), arg)
                    arr = pc.if_else(pc.fill_null(over, False),
                                     pc.utf8_slice_codeunits(arr, 0, arg),
                                     arr)
            delta = pc.fill_null(
                pc.or_kleene(pc.not_equal(orig, arr),
                             pc.and_(pc.is_null(orig),
                                     pc.is_valid(arr))), False)
            changed = pc.or_(changed, delta)
            batch = batch.set_column(
                batch.column_names.index(col), col, arr)
        return batch.append_column("repaired", changed)

    return apply, [c for c, _ in rules]


def repair_dataset(ds, spec: dict):
    """Apply `compile_repair(spec)` across a Dataset (zero-copy Arrow
    batches; the plan compiles once on the driver and ships as a
    closure)."""
    fn, _ = compile_repair(spec)
    return ds.map_batches(fn, batch_format="pyarrow")
