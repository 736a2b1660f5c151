"""Recursive $ref specs unroll to the Arrow type's static depth instead of
falling back: a revisit of the same target at a strictly smaller dtype is
progress, not a cycle (evaluator._compile_resolved_ref)."""

import json

import pyarrow as pa

from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.evaluator import compile_spec, strip_absent
from jschon_ray.vspec.row_oracle import RowEvaluator, output_basic

TREE = {"$id": "https://example.com/rec/tree", "type": "object",
        "properties": {"data": {"type": ["integer", "null"], "minimum": 0},
                       "children": {"type": "array",
                                    "items": {"$ref": "#"}}}}

LEAF = pa.struct([("data", pa.int64())])
MID = pa.struct([("data", pa.int64()), ("children", pa.list_(LEAF))])
TABLE = pa.table({
    "data": pa.array([1, 2, None, -5], pa.int64()),
    "children": pa.array(
        [[{"data": 5, "children": [{"data": 7}]}],
         [{"data": -3, "children": [{"data": -9}, {"data": 4}]}],
         None,
         []],
        pa.list_(MID)),
})


def _walk_types(root):
    out = []

    def walk(n):
        out.append(type(n).__name__)
        for attr in ("kws", "sub", "subs", "props", "cols_subs", "matches"):
            v = getattr(n, attr, None)
            if v is None:
                continue
            for it in (v if isinstance(v, list) else [v]):
                if isinstance(it, tuple):
                    it = it[-1]
                if hasattr(it, "evaluate"):
                    walk(it)
    walk(root)
    return out


def test_recursive_ref_unrolls_without_fallback():
    cs = compile_spec(TREE, TABLE.schema, catalog=SpecCatalog())
    names = _walk_types(cs.root)
    assert "FallbackCS" not in names, names
    assert names.count("RefCKw") >= 2  # unrolled through two levels


def test_recursive_ref_parity_with_row_oracle():
    cs = compile_spec(TREE, TABLE.schema, catalog=SpecCatalog())
    valid, viols = cs.evaluate_table(TABLE)
    ev = RowEvaluator(SpecCatalog())
    for i, raw in enumerate(TABLE.to_pylist()):
        row = strip_absent(raw)
        ours = output_basic(ev.evaluate(TREE, row))
        assert bool(valid[i]) == ours["valid"], (i, row)
        if not ours["valid"]:
            exp = [{**e, "error": e["error"] if isinstance(e["error"], str)
                    else json.dumps(e["error"], ensure_ascii=False)}
                   for e in ours["errors"]]
            assert viols[i] == exp, (
                i, json.dumps(viols[i], indent=1), json.dumps(exp, indent=1))
    # nested negatives at both depths actually fail
    assert [bool(v) for v in valid] == [True, False, True, False]
