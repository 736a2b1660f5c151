"""Recursive schema extension with $dynamicRef/$dynamicAnchor — the
strict-tree pattern (/root/reference/jschon/vocabulary/core.py:121-169).

`tree` validates any node tree; `strict-tree` re-binds the dynamic anchor
so every recursion level also rejects unknown properties.
"""
from jschon_ray.vspec.catalog import SpecCatalog
from jschon_ray.vspec.row_oracle import RowEvaluator, output_basic

TREE = {
    "$id": "https://example.com/ex/tree",
    "$dynamicAnchor": "node",
    "type": "object",
    "properties": {
        "data": True,
        "children": {"type": "array", "items": {"$dynamicRef": "#node"}},
    },
}
STRICT = {
    "$id": "https://example.com/ex/strict-tree",
    "$dynamicAnchor": "node",
    "$ref": "tree",
    "unevaluatedProperties": False,
}

cat = SpecCatalog()
cat.register(TREE)
ev = RowEvaluator(cat)
for instance in ({"children": [{"data": 1}]},
                 {"children": [{"daat": 1}]}):
    for name, spec in (("tree", TREE), ("strict-tree", STRICT)):
        out = output_basic(ev.evaluate(spec, instance))
        import json
        errs = [f'{e["instanceLocation"]} {json.dumps(e["error"])}'
                for e in out.get("errors", [])]
        print(name, instance, out["valid"], errs)
